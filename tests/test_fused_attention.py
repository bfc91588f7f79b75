"""Fused-QKV attention == flax MultiHeadDotProductAttention, same params.

The fused path (``models/layers._FusedMHACore``) declares the exact same
parameter tree (names, shapes, init draws) as the flax module the unfused
path uses, so one set of params must produce the same outputs through both.
Reference semantics being preserved: ``encoder_decoder_layers.py:189-407``
(torch nn.MultiheadAttention blocks), already pinned differentially by
tests/test_reference_parity.py — this test pins the fused path to the
unfused one.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eda_tpu.config import ModelConfig
from eda_tpu.models import EDAGrounder
from eda_tpu.models.layers import BiDecoderLayer, BiEncoderLayer


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_encoder_layer_param_tree_and_init_identical(rng):
    """Same param names/shapes AND the same init draws for both paths."""
    kw = dict(d_model=32, n_heads=4, dim_feedforward=24, use_butd_enc_attn=True)
    vis = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(2, 9, 32)), jnp.float32)
    det = jnp.asarray(rng.normal(size=(2, 5, 32)), jnp.float32)
    args = (vis, pos, None, txt, None, det, None)
    v0 = BiEncoderLayer(**kw, fused_qkv=False).init(
        jax.random.key(7), *args, train=False
    )
    v1 = BiEncoderLayer(**kw, fused_qkv=True).init(
        jax.random.key(7), *args, train=False
    )
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    _tree_equal(v0, v1)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_encoder_layer_fused_matches_unfused(rng, dtype):
    kw = dict(d_model=32, n_heads=4, dim_feedforward=24, dtype=dtype)
    vis = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(2, 9, 32)), jnp.float32)
    tvalid = jnp.asarray([[1] * 6 + [0] * 3, [1] * 9], bool)
    args = (vis, pos, None, txt, tvalid)
    ref = BiEncoderLayer(**kw, fused_qkv=False)
    fused = BiEncoderLayer(**kw, fused_qkv=True)
    variables = ref.init(jax.random.key(0), *args, train=False)
    out0 = ref.apply(variables, *args, train=False)
    out1 = fused.apply(variables, *args, train=False)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    for a, b in zip(out0, out1):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=tol
        )


def test_decoder_layer_fused_matches_unfused(rng):
    kw = dict(d_model=32, n_heads=4, dim_feedforward=24, butd=True)
    q = jnp.asarray(rng.normal(size=(2, 8, 32)), jnp.float32)
    vis = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(2, 9, 32)), jnp.float32)
    loc = jnp.asarray(rng.normal(size=(2, 8, 6)), jnp.float32)
    det = jnp.asarray(rng.normal(size=(2, 5, 32)), jnp.float32)
    dvalid = jnp.asarray([[1, 1, 1, 0, 0], [1] * 5], bool)
    args = (q, vis, txt, loc, None, det, dvalid)
    ref = BiDecoderLayer(**kw, fused_qkv=False)
    fused = BiDecoderLayer(**kw, fused_qkv=True)
    variables = ref.init(jax.random.key(1), *args, train=False)
    out0 = ref.apply(variables, *args, train=False)
    out1 = fused.apply(variables, *args, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)


def test_full_model_fused_matches_unfused(rng):
    """End-to-end: the tiny grounder gives the same end_points either way."""
    from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes

    cfg = ModelConfig().tiny()
    gen = SyntheticScenes(
        SyntheticConfig(
            num_points=cfg.num_points,
            num_objects=4,
            text_len=16,
            max_objects=cfg.max_detected_boxes,
        ),
        vocab_size=cfg.text_vocab_size,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, gen.batch(range(2)))
    model0 = EDAGrounder(cfg)
    model1 = EDAGrounder(dataclasses.replace(cfg, fused_qkv=True))
    variables = model0.init(jax.random.key(0), batch["inputs"], train=False)
    out0 = model0.apply(variables, batch["inputs"], train=False)
    out1 = model1.apply(variables, batch["inputs"], train=False)
    for key in ("last_center", "last_pred_size", "last_sem_cls_scores"):
        np.testing.assert_allclose(
            np.asarray(out0[key]), np.asarray(out1[key]), atol=2e-4, rtol=1e-4
        )


def test_roberta_layer_fused_matches_unfused(rng):
    from eda_tpu.models.roberta import RobertaLayer

    h = jnp.asarray(rng.normal(size=(2, 12, 48)), jnp.float32)
    valid = jnp.asarray([[1] * 8 + [0] * 4, [1] * 12], bool)
    ref = RobertaLayer(48, 4, 96, fused_qkv=False)
    fused = RobertaLayer(48, 4, 96, fused_qkv=True)
    variables = ref.init(jax.random.key(3), h, valid, train=False)
    v1 = fused.init(jax.random.key(3), h, valid, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v1)
    _tree_equal(variables, v1)
    out0 = ref.apply(variables, h, valid, train=False)
    out1 = fused.apply(variables, h, valid, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)


def test_fused_train_mode_gradients_match(rng):
    """Train-mode (dropout off via rate override) grads agree across paths."""
    kw = dict(d_model=32, n_heads=4, dim_feedforward=24, dropout=0.0)
    vis = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(2, 9, 32)), jnp.float32)
    args = (vis, pos, None, txt, None)
    ref = BiEncoderLayer(**kw, fused_qkv=False)
    fused = BiEncoderLayer(**kw, fused_qkv=True)
    variables = ref.init(jax.random.key(0), *args, train=False)

    def loss(params, model):
        out = model.apply({"params": params}, *args, train=True)
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    g0 = jax.grad(loss)(variables["params"], ref)
    g1 = jax.grad(loss)(variables["params"], fused)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
