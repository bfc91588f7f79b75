"""Model shape/jit tests on the tiny config (SURVEY.md §4: shape/jit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eda_tpu.config import ModelConfig
from eda_tpu.models import EDAGrounder, PointNetPPBackbone, decoder_prefixes

TINY = ModelConfig().tiny()


def make_inputs(rng, cfg: ModelConfig, batch=2, butd=False):
    inputs = {
        "point_clouds": jnp.asarray(
            rng.uniform(-2, 2, size=(batch, cfg.num_points, 3 + cfg.input_feature_dim)).astype(np.float32)
        ),
        "text_ids": jnp.asarray(rng.integers(4, cfg.text_vocab_size, size=(batch, 32)).astype(np.int32)),
        "text_mask": jnp.asarray(np.tile(np.arange(32) < 20, (batch, 1))),
    }
    if butd:
        inputs["det_boxes"] = jnp.asarray(
            rng.uniform(0, 1, size=(batch, cfg.max_detected_boxes, 6)).astype(np.float32)
        )
        inputs["det_class_ids"] = jnp.asarray(
            rng.integers(0, cfg.num_obj_class, size=(batch, cfg.max_detected_boxes)).astype(np.int32)
        )
        inputs["det_mask"] = jnp.asarray(np.tile(np.arange(cfg.max_detected_boxes) < 5, (batch, 1)))
    return inputs


def test_backbone_shapes(rng):
    cfg = TINY
    bb = PointNetPPBackbone(
        npoints=tuple(cfg.sa_npoints),
        radii=tuple(cfg.sa_radii),
        nsamples=tuple(cfg.sa_nsamples),
        mlps=tuple(tuple(m) for m in cfg.sa_mlps),
        fp_mlps=tuple(tuple(m) for m in cfg.fp_mlps),
    )
    pc = jnp.asarray(rng.uniform(-2, 2, size=(2, cfg.num_points, 6)).astype(np.float32))
    variables = jax.jit(lambda: bb.init(jax.random.key(0), pc, train=False))()
    out = bb.apply(variables, pc, train=False)
    K = cfg.sa_npoints[1]
    assert out["fp2_features"].shape == (2, K, cfg.fp_mlps[1][-1])
    assert out["fp2_xyz"].shape == (2, K, 3)
    assert out["fp2_inds"].shape == (2, K)
    # fp2_inds index into the raw cloud
    assert int(np.asarray(out["fp2_inds"]).max()) < cfg.num_points


@pytest.mark.parametrize("butd", [False, True])
def test_grounder_forward_shapes(rng, butd):
    import dataclasses

    cfg = dataclasses.replace(TINY, butd=butd)
    model = EDAGrounder(cfg)
    inputs = make_inputs(rng, cfg, butd=butd)
    variables = jax.jit(lambda: model.init(jax.random.key(0), inputs, train=False))()
    out = model.apply(variables, inputs, train=False)

    B, Q, C = 2, cfg.num_queries, cfg.num_class
    for prefix in decoder_prefixes(cfg.num_decoder_layers):
        assert out[f"{prefix}center"].shape == (B, Q, 3), prefix
        assert out[f"{prefix}pred_size"].shape == (B, Q, 3), prefix
        assert out[f"{prefix}sem_cls_scores"].shape == (B, Q, C), prefix
        assert out[f"{prefix}proj_queries"].shape == (B, Q, cfg.contrastive_dim)
    assert out["proj_tokens"].shape == (B, 32, cfg.contrastive_dim)
    assert out["seeds_obj_cls_logits"].shape == (B, cfg.sa_npoints[1])
    assert out["query_points_sample_inds"].shape == (B, Q)
    # contrastive projections are unit-norm
    norms = np.linalg.norm(np.asarray(out["proj_tokens"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_grounder_train_mode_mutates_batch_stats(rng):
    cfg = TINY
    model = EDAGrounder(cfg)
    inputs = make_inputs(rng, cfg)
    variables = jax.jit(lambda: model.init(jax.random.key(0), inputs, train=False))()
    out, mutated = model.apply(
        variables,
        inputs,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    assert "batch_stats" in mutated
    # running stats actually moved
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )
    assert moved


def test_grounder_jit_and_determinism(rng):
    cfg = TINY
    model = EDAGrounder(cfg)
    inputs = make_inputs(rng, cfg)
    variables = jax.jit(lambda: model.init(jax.random.key(0), inputs, train=False))()
    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    a = f(variables, inputs)
    b = f(variables, inputs)
    np.testing.assert_array_equal(np.asarray(a["last_center"]), np.asarray(b["last_center"]))


def test_query_selection_picks_topk_objectness(rng):
    cfg = TINY
    model = EDAGrounder(cfg)
    inputs = make_inputs(rng, cfg)
    variables = jax.jit(lambda: model.init(jax.random.key(0), inputs, train=False))()
    out = model.apply(variables, inputs, train=False)
    logits = np.asarray(out["seeds_obj_cls_logits"])
    inds = np.asarray(out["query_points_sample_inds"])
    for b in range(2):
        want = set(np.argsort(-logits[b])[: cfg.num_queries].tolist())
        assert set(inds[b].tolist()) == want
