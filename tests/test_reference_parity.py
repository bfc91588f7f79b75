"""Differential parity tests against the ACTUAL reference code.

Every other numerics test in this suite compares eda_tpu against a
transcription the repo's author wrote (numpy ports, fabricated torch
look-alikes). These tests remove that self-referential loop: they load the
reference's own ``models/losses.py`` and ``models/encoder_decoder_layers.py``
from ``/root/reference`` (both import cleanly on CPU torch + scipy, with no
CUDA dependency) and assert numerical agreement on identical random
inputs/weights.

Covered here:

* ``compute_hungarian_loss`` + ``SetCriterion`` (losses.py:339-739) vs
  ``eda_tpu.losses.criterion.compute_hungarian_loss`` — every loss term;
* ``HungarianMatcher`` (losses.py:231-336, scipy) vs the on-device auction;
* ``compute_points_obj_cls_loss_hard_topk`` (losses.py:166-228) vs kps_loss;
* ``BiEncoderLayer`` / ``BiDecoderLayer`` (encoder_decoder_layers.py:189-407)
  eval-mode forwards through ``train/convert.py``'s state-dict mapping.

The reference modules are loaded standalone via importlib (file path, not
package import) because ``models/__init__.py`` pulls in the CUDA _ext build.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from eda_tpu.losses.criterion import (
    SetCriterionConfig,
    compute_hungarian_loss,
    kps_loss,
)
from eda_tpu.losses.matcher import hungarian_match
from eda_tpu.ops.boxes import box_cxcyczwhd_to_xyzxyz

REF = "/root/reference"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_losses():
    return _load("_ref_losses", f"{REF}/models/losses.py")


@pytest.fixture(scope="module")
def ref_edl():
    return _load("_ref_edl", f"{REF}/models/encoder_decoder_layers.py")


# ---------------------------------------------------------------------------
# Fabricated batch shared by the loss tests
# ---------------------------------------------------------------------------

B, Q, G, C, L, K, N = 3, 16, 8, 256, 24, 64, 200
N_VALID = [1, 2, 3]
TOPK = 4
NUM_DEC = 6


def _soft_map(rng, rows, width, max_span, allow_empty):
    """Row-normalized sparse map like the data pipeline's positive maps."""
    out = np.zeros((rows, width), np.float32)
    for r in range(rows):
        if allow_empty and rng.random() < 0.4:
            continue
        span = rng.integers(1, max_span + 1)
        start = rng.integers(0, width - span)
        out[r, start:start + span] = 1.0 / span
    return out


def _fabricate(seed=0):
    rng = np.random.default_rng(seed)
    d = {}
    d["center_label"] = rng.normal(size=(B, G, 3)).astype(np.float32)
    d["size_gts"] = rng.uniform(0.2, 1.5, size=(B, G, 3)).astype(np.float32)
    d["sem_cls_label"] = rng.integers(0, 18, size=(B, G)).astype(np.int64)
    mask = np.zeros((B, G), np.float32)
    for b, n in enumerate(N_VALID):
        mask[b, :n] = 1.0
    d["box_label_mask"] = mask
    for key, allow_empty in (
        ("positive_map", False),
        ("modify_positive_map", True),
        ("pron_positive_map", True),
        ("other_entity_map", True),
        ("rel_positive_map", True),
    ):
        d[key] = np.stack(
            # use only the first L token positions, like real maps
            [_soft_map(rng, G, L, 4, allow_empty) for _ in range(B)]
        )
        d[key] = np.pad(d[key], ((0, 0), (0, 0), (0, C - L)))
    d["auxi_entity_positive_map"] = np.pad(
        np.stack([_soft_map(rng, 1, L, 4, False) for _ in range(B)]),
        ((0, 0), (0, 0), (0, C - L)),
    )
    d["auxi_box"] = np.concatenate(
        [
            rng.normal(size=(B, 1, 3)).astype(np.float32),
            rng.uniform(0.2, 1.5, size=(B, 1, 3)).astype(np.float32),
        ],
        axis=-1,
    )
    # text
    lengths = rng.integers(10, L + 1, size=(B,))
    attn = np.zeros((B, L), np.int64)
    for b, n in enumerate(lengths):
        attn[b, :n] = 1
    d["attention_mask"] = attn
    d["proj_tokens"] = rng.normal(size=(B, L, 64)).astype(np.float32)
    d["proj_tokens"] /= np.linalg.norm(d["proj_tokens"], axis=-1, keepdims=True)
    # seeds (KPS). Every GT must have >= TOPK assigned seeds: when it has
    # fewer, the reference's topk (losses.py:196-199) back-fills positives
    # from seeds at the tied sentinel distance 100, and WHICH tied seed wins
    # is implementation-defined (torch CPU returns highest-index ties, CUDA
    # is unspecified, jax.lax.top_k returns lowest). Parity is only defined
    # outside that regime, so construct labels giving each GT K//G seeds.
    inst = np.arange(K, dtype=np.int64) % (G + 2)
    inst = np.tile(np.where(inst < G, inst, -1), (B, 1))  # some bg seeds too
    tail = rng.integers(-1, G, size=(B, N - K)).astype(np.int64)
    d["point_instance_label"] = np.concatenate([inst, tail], axis=1)
    d["seed_inds"] = np.stack([rng.permutation(K) for _ in range(B)]).astype(
        np.int64
    )
    d["seed_xyz"] = rng.normal(size=(B, K, 3)).astype(np.float32)
    d["seeds_obj_cls_logits"] = rng.normal(size=(B, K)).astype(np.float32)
    # per-prefix predictions
    prefixes = ["proposal_", "last_"] + [f"{i}head_" for i in range(NUM_DEC - 1)]
    for p in prefixes:
        d[f"{p}center"] = rng.normal(size=(B, Q, 3)).astype(np.float32)
        d[f"{p}pred_size"] = rng.uniform(0.2, 1.5, size=(B, Q, 3)).astype(
            np.float32
        )
        d[f"{p}sem_cls_scores"] = rng.normal(size=(B, Q, C)).astype(np.float32)
        pq = rng.normal(size=(B, Q, 64)).astype(np.float32)
        d[f"{p}proj_queries"] = pq / np.linalg.norm(pq, axis=-1, keepdims=True)
    return d


def _ref_end_points(d, dataset):
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in d.items()}
    t["seeds_obj_cls_logits"] = t["seeds_obj_cls_logits"][:, None, :]  # (B,1,K)
    t["tokenized"] = {"attention_mask": t.pop("attention_mask")}
    t["language_dataset"] = [dataset] * B
    return t


def _our_inputs(d):
    end_points = {
        k: jnp.asarray(v)
        for k, v in d.items()
        if "head_" in k
        or k.startswith(("proposal_", "last_", "seed", "proj_tokens"))
    }
    targets = {
        k: jnp.asarray(d[k])
        for k in (
            "center_label",
            "size_gts",
            "box_label_mask",
            "positive_map",
            "modify_positive_map",
            "pron_positive_map",
            "other_entity_map",
            "rel_positive_map",
            "point_instance_label",
        )
    }
    targets["text_lengths"] = jnp.asarray(d["attention_mask"].sum(1))
    return end_points, targets


def _run_reference(ref_losses, d, dataset):
    matcher = ref_losses.HungarianMatcher(
        cost_class=1, cost_bbox=0, cost_giou=2, soft_token=True
    )
    criterion = ref_losses.SetCriterion(
        matcher=matcher,
        losses=["boxes", "labels", "contrastive_align"],
        eos_coef=0.1,
        temperature=0.07,
    )
    end_points = _ref_end_points(d, dataset)
    with torch.no_grad():
        loss, ep = ref_losses.compute_hungarian_loss(
            end_points, NUM_DEC, criterion, query_points_obj_topk=TOPK
        )
    return loss, ep


@pytest.mark.parametrize("dataset", ["scanrefer", "sr3d"])
def test_hungarian_loss_parity(ref_losses, dataset):
    """Every loss term of compute_hungarian_loss matches the reference
    (losses.py:650-739) on identical fabricated inputs."""
    d = _fabricate(seed=0 if dataset == "scanrefer" else 1)
    ref_loss, ref_ep = _run_reference(ref_losses, d, dataset)

    cfg = SetCriterionConfig(
        num_decoder_layers=NUM_DEC,
        dataset=dataset,
        query_points_obj_topk=TOPK,
    )
    end_points, targets = _our_inputs(d)
    loss, metrics = jax.jit(
        lambda ep, tg: compute_hungarian_loss(cfg, ep, tg)
    )(end_points, targets)

    for ours, theirs in (
        ("loss_ce", "loss_ce"),
        ("loss_bbox", "loss_bbox"),
        ("loss_giou", "loss_giou"),
        ("loss_sem_align", "loss_sem_align"),
        ("query_points_generation_loss", "query_points_generation_loss"),
        ("loss", "loss"),
    ):
        ref_val = float(ref_ep[theirs])
        our_val = float(metrics[ours])
        assert our_val == pytest.approx(ref_val, rel=2e-4, abs=2e-4), (
            ours, our_val, ref_val,
        )


def test_per_prefix_loss_parity(ref_losses):
    """Per-prefix loss terms match too (catches a vmap mis-stacking that a
    summed total could hide)."""
    d = _fabricate(seed=2)
    _, ref_ep = _run_reference(ref_losses, d, "scanrefer")
    cfg = SetCriterionConfig(
        num_decoder_layers=NUM_DEC,
        dataset="scanrefer",
        query_points_obj_topk=TOPK,
    )
    end_points, targets = _our_inputs(d)
    _, metrics = compute_hungarian_loss(cfg, end_points, targets)
    prefixes = ["proposal_", "last_"] + [f"{i}head_" for i in range(NUM_DEC - 1)]
    for p in prefixes:
        for term in ("loss_ce", "loss_bbox", "loss_giou", "loss_sem_align"):
            # reference writes f'{prefix}_{key}' (losses.py:707)
            ref_val = float(ref_ep[f"{p}_{term}"])
            our_val = float(metrics[f"{p}{term}"])
            assert our_val == pytest.approx(ref_val, rel=2e-4, abs=2e-4), (
                p, term, our_val, ref_val,
            )


def test_kps_loss_parity(ref_losses):
    """compute_points_obj_cls_loss_hard_topk (losses.py:166-228) vs kps_loss,
    including the index-wrap drop of padded GTs and the background zeroing."""
    d = _fabricate(seed=3)
    ep = _ref_end_points(d, "scanrefer")
    with torch.no_grad():
        ref_val = float(
            ref_losses.compute_points_obj_cls_loss_hard_topk(ep, TOPK)
        )
    end_points, targets = _our_inputs(d)
    ours = float(kps_loss(end_points, targets, TOPK))
    assert ours == pytest.approx(ref_val, rel=1e-5, abs=1e-6)


@pytest.mark.parametrize("seed", [0, 7])
def test_matcher_parity_vs_reference_scipy(ref_losses, seed):
    """The on-device auction reaches the reference scipy assignment's total
    cost (within the documented G*eps bound) on the reference's own cost
    construction (losses.py:261-336)."""
    d = _fabricate(seed=seed)
    matcher = ref_losses.HungarianMatcher(
        cost_class=1, cost_bbox=0, cost_giou=2, soft_token=True
    )
    outputs = {
        "pred_logits": torch.from_numpy(d["last_sem_cls_scores"]),
        "pred_boxes": torch.from_numpy(
            np.concatenate([d["last_center"], d["last_pred_size"]], -1)
        ),
    }
    targets = []
    for b, n in enumerate(N_VALID):
        targets.append(
            {
                "labels": torch.from_numpy(d["sem_cls_label"][b, :n]),
                "boxes": outputs["pred_boxes"].new_tensor(
                    np.concatenate(
                        [d["center_label"][b, :n], d["size_gts"][b, :n]], -1
                    )
                ),
                "positive_map": torch.from_numpy(d["positive_map"][b, :n]),
            }
        )
    with torch.no_grad():
        ref_indices = matcher(outputs, targets)

    gt_boxes = jnp.concatenate(
        [jnp.asarray(d["center_label"]), jnp.asarray(d["size_gts"])], -1
    )
    pred_boxes = jnp.concatenate(
        [jnp.asarray(d["last_center"]), jnp.asarray(d["last_pred_size"])], -1
    )
    match = hungarian_match(
        jnp.asarray(d["last_sem_cls_scores"]),
        box_cxcyczwhd_to_xyzxyz(pred_boxes),
        pred_boxes,
        gt_boxes,
        box_cxcyczwhd_to_xyzxyz(gt_boxes),
        jnp.asarray(d["positive_map"]),
        jnp.asarray(d["box_label_mask"]) > 0,
    )

    # Rebuild both total costs from the reference's own cost matrix.
    prob = torch.softmax(outputs["pred_logits"], -1).numpy()
    for b, n in enumerate(N_VALID):
        cost = (
            -prob[b] @ d["positive_map"][b, :n].T
            + 2.0
            * -np.asarray(
                ref_losses.generalized_box_iou3d(
                    ref_losses.box_cxcyczwhd_to_xyzxyz(
                        outputs["pred_boxes"][b]
                    ),
                    ref_losses.box_cxcyczwhd_to_xyzxyz(targets[b]["boxes"]),
                )
            )
        )  # (Q, n)
        qi, tj = ref_indices[b]
        ref_total = cost[qi.numpy(), tj.numpy()].sum()
        ours_q = np.asarray(match.match_q[b, :n])
        assert len(set(ours_q.tolist())) == n  # one-to-one
        our_total = cost[ours_q, np.arange(n)].sum()
        assert our_total <= ref_total + n * 1e-4 + 1e-6


# ---------------------------------------------------------------------------
# Encoder/decoder layer forward parity through the converter
# ---------------------------------------------------------------------------

D_MODEL, HEADS, DFF = 64, 4, 96
VB, VN, TL, NQ, ND = 2, 12, 9, 10, 5


def _randomize_module(mod, gen):
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
        for name, buf in mod.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=gen) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)


def test_bi_encoder_layer_forward_parity(ref_edl):
    """Reference BiEncoderLayer (encoder_decoder_layers.py:189-255) eval-mode
    forward == our BiEncoderLayer with weights mapped by train/convert.py,
    including butd cross-attention and padding-mask semantics."""
    from eda_tpu.models.layers import BiEncoderLayer
    from eda_tpu.train import convert as cv

    gen = torch.Generator().manual_seed(11)
    ref = ref_edl.BiEncoderLayer(
        d_model=D_MODEL,
        dropout=0.0,
        n_heads=HEADS,
        dim_feedforward=DFF,
        self_attend_lang=True,
        self_attend_vis=True,
        use_butd_enc_attn=True,
    ).eval()
    _randomize_module(ref, gen)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    params = {
        "self_vis": cv._residual_attn(
            sd, "self_attention_visual.self_attn",
            "self_attention_visual.norm1", HEADS,
        ),
        "self_lang": cv._residual_attn(
            sd, "self_attention_lang.self_attn",
            "self_attention_lang.norm1", HEADS,
        ),
        "cross_lv": cv._residual_attn(
            sd, "cross_layer.cross_lv", "cross_layer.norm_lv", HEADS
        ),
        "ffn_lv": cv._ffn(sd, "cross_layer.ffn_lv", "cross_layer.norm_lv2"),
        "cross_vl": cv._residual_attn(
            sd, "cross_layer.cross_vl", "cross_layer.norm_vl", HEADS
        ),
        "cross_d": cv._residual_attn(
            sd, "cross_layer.cross_d", "cross_layer.norm_d", HEADS
        ),
        "ffn_vl": cv._ffn(sd, "cross_layer.ffn_vl", "cross_layer.norm_vl2"),
    }

    rng = np.random.default_rng(5)
    vis = rng.normal(size=(VB, VN, D_MODEL)).astype(np.float32)
    pos = rng.normal(size=(VB, VN, D_MODEL)).astype(np.float32)
    text = rng.normal(size=(VB, TL, D_MODEL)).astype(np.float32)
    det = rng.normal(size=(VB, 6, D_MODEL)).astype(np.float32)
    text_valid = np.ones((VB, TL), bool)
    text_valid[0, 6:] = False
    det_valid = np.ones((VB, 6), bool)
    det_valid[1, 4:] = False

    with torch.no_grad():
        ref_vis, ref_text = ref(
            torch.from_numpy(vis),
            torch.from_numpy(pos),
            None,
            torch.from_numpy(text),
            torch.from_numpy(~text_valid),  # torch: True = pad
            {},
            detected_feats=torch.from_numpy(det),
            detected_mask=torch.from_numpy(~det_valid),
        )

    layer = BiEncoderLayer(
        d_model=D_MODEL,
        n_heads=HEADS,
        dim_feedforward=DFF,
        dropout=0.0,
        self_attend=True,
        use_butd_enc_attn=True,
    )
    our_vis, our_text = layer.apply(
        {"params": params},
        jnp.asarray(vis),
        jnp.asarray(pos),
        None,
        jnp.asarray(text),
        jnp.asarray(text_valid),
        jnp.asarray(det),
        jnp.asarray(det_valid),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(our_vis), ref_vis.numpy(), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(our_text), ref_text.numpy(), rtol=2e-5, atol=2e-5
    )


def test_bi_decoder_layer_forward_parity(ref_edl):
    """Reference BiDecoderLayer (encoder_decoder_layers.py:288-407) eval-mode
    forward == ours: self -> text -> boxes -> vision -> FFN with the learned
    6-d location embedding added to q (and k in self-attn) everywhere."""
    from eda_tpu.models.layers import BiDecoderLayer
    from eda_tpu.train import convert as cv

    gen = torch.Generator().manual_seed(13)
    ref = ref_edl.BiDecoderLayer(
        d_model=D_MODEL,
        n_heads=HEADS,
        dim_feedforward=DFF,
        dropout=0.0,
        self_position_embedding="loc_learned",
        butd=True,
    ).eval()
    _randomize_module(ref, gen)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    params = {
        "self_attn": cv._residual_attn(sd, "self_attn", "norm1", HEADS),
        "cross_l": cv._residual_attn(sd, "cross_l", "norm_l", HEADS),
        "cross_d": cv._residual_attn(sd, "cross_d", "norm_d", HEADS),
        "cross_v": cv._residual_attn(sd, "cross_v", "norm_v", HEADS),
        "ffn": cv._ffn(sd, "ffn", "norm2"),
    }
    pe_params, pe_stats = cv._pos_embed(sd, "self_posembed")
    params["self_posembed"] = pe_params

    rng = np.random.default_rng(6)
    query = rng.normal(size=(VB, NQ, D_MODEL)).astype(np.float32)
    vis = rng.normal(size=(VB, VN, D_MODEL)).astype(np.float32)
    text = rng.normal(size=(VB, TL, D_MODEL)).astype(np.float32)
    loc = rng.normal(size=(VB, NQ, 6)).astype(np.float32)
    det = rng.normal(size=(VB, ND, D_MODEL)).astype(np.float32)
    text_valid = np.ones((VB, TL), bool)
    text_valid[1, 5:] = False
    det_valid = np.ones((VB, ND), bool)
    det_valid[0, 3:] = False

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(query),
            torch.from_numpy(vis),
            torch.from_numpy(text),
            torch.from_numpy(loc),
            None,
            torch.from_numpy(~text_valid),
            detected_feats=torch.from_numpy(det),
            detected_mask=torch.from_numpy(~det_valid),
        )

    layer = BiDecoderLayer(
        d_model=D_MODEL,
        n_heads=HEADS,
        dim_feedforward=DFF,
        dropout=0.0,
        self_position_embedding="loc_learned",
        butd=True,
    )
    ours = layer.apply(
        {"params": params, "batch_stats": {"self_posembed": pe_stats}},
        jnp.asarray(query),
        jnp.asarray(vis),
        jnp.asarray(text),
        jnp.asarray(loc),
        jnp.asarray(text_valid),
        jnp.asarray(det),
        jnp.asarray(det_valid),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy(), rtol=2e-5, atol=2e-5
    )


# ---------------------------------------------------------------------------
# GroundingEvaluator parity
# ---------------------------------------------------------------------------

EB, EQ, EG, EL, ED = 4, 20, 5, 24, 6  # batch, queries, gt slots, tokens, det


@pytest.fixture(scope="module")
def ref_grounding_evaluator(ref_losses):
    """Load src/grounding_evaluator.py with its package imports stubbed to
    the standalone-loaded reference modules (models.losses, utils.misc)."""
    import types

    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = []
    models_pkg.losses = ref_losses
    sys.modules.setdefault("models", models_pkg)
    sys.modules["models.losses"] = ref_losses
    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = []
    sys.modules.setdefault("utils", utils_pkg)
    misc = _load("utils.misc", f"{REF}/utils/misc.py")
    utils_pkg.misc = misc
    return _load("_ref_grounding_eval", f"{REF}/src/grounding_evaluator.py")


def _fabricate_eval(seed=0, butd_cls=False):
    """``butd_cls`` keeps the fabricated batch out of the tie regime: the
    filter zeroes non-overlapping queries' scores EXACTLY, and how torch
    argsort vs jax top_k order tied zeros is implementation-defined. Detected
    boxes therefore cover >= 12 predictions verbatim (top-10 never reaches
    the zeros) and the negative 'other' component is emptied so surviving
    scores stay strictly positive."""
    rng = np.random.default_rng(seed)
    d = {}
    for p in ("last_", "proposal_"):
        d[f"{p}center"] = rng.normal(size=(EB, EQ, 3)).astype(np.float32)
        d[f"{p}pred_size"] = rng.uniform(0.3, 1.8, (EB, EQ, 3)).astype(
            np.float32
        )
        d[f"{p}sem_cls_scores"] = rng.normal(size=(EB, EQ, 256)).astype(
            np.float32
        )
        pq = rng.normal(size=(EB, EQ, 64)).astype(np.float32)
        d[f"{p}proj_queries"] = pq / np.linalg.norm(pq, axis=-1, keepdims=True)
    pt = rng.normal(size=(EB, EL, 64)).astype(np.float32)
    d["proj_tokens"] = pt / np.linalg.norm(pt, axis=-1, keepdims=True)
    # GT: make boxes near some predictions so hits occur at both thresholds
    d["center_label"] = d["last_center"][:, :EG] + rng.normal(
        scale=0.15, size=(EB, EG, 3)
    ).astype(np.float32)
    d["size_gts"] = d["last_pred_size"][:, :EG] * rng.uniform(
        0.8, 1.25, (EB, EG, 3)
    ).astype(np.float32)
    mask = np.zeros((EB, EG), np.float32)
    for b in range(EB):
        mask[b, : 1 + b % 3] = 1.0
    d["box_label_mask"] = mask
    for key, allow_empty in (
        ("positive_map", False),
        ("modify_positive_map", True),
        ("pron_positive_map", True),
        ("other_entity_map", True),
        ("rel_positive_map", True),
        ("auxi_entity_positive_map", True),
    ):
        m = np.stack([_soft_map(rng, EG, EL, 4, allow_empty) for _ in range(EB)])
        if butd_cls and key == "other_entity_map":
            m = np.zeros_like(m)
        d[key] = np.pad(m, ((0, 0), (0, 0), (0, 256 - EL)))
    d["is_view_dep"] = rng.random(EB) < 0.5
    d["is_hard"] = rng.random(EB) < 0.5
    d["is_unique"] = rng.random(EB) < 0.5
    # detected boxes for the butd_cls filter
    nd = 12 if butd_cls else ED
    d["all_detected_boxes"] = np.concatenate(
        [
            d["last_center"][:, :nd]
            if butd_cls
            else d["last_center"][:, :nd] + rng.normal(
                scale=0.2, size=(EB, nd, 3)
            ).astype(np.float32),
            d["last_pred_size"][:, :nd],
        ],
        -1,
    )
    det_mask = np.ones((EB, nd), bool)
    if not butd_cls:
        det_mask[0, 3:] = False
    d["all_detected_bbox_label_mask"] = det_mask
    return d


@pytest.mark.parametrize("butd_cls", [False, True])
def test_grounding_evaluator_parity(ref_grounding_evaluator, butd_cls):
    """Every (prefix, threshold, topk, mode) counter and hardness-breakdown
    counter matches the reference GroundingEvaluator
    (src/grounding_evaluator.py:135-373) on identical fabricated inputs."""
    from eda_tpu.eval import GroundingEvaluator

    # butd_cls: detected boxes are tie-free only vs the last_ predictions
    # (see _fabricate_eval), so the filtered variant scores last_ only
    prefixes = ("last_",) if butd_cls else ("last_", "proposal_")
    d = _fabricate_eval(seed=4 + butd_cls, butd_cls=butd_cls)
    ep_t = {k: torch.from_numpy(np.asarray(v)) for k, v in d.items()}
    ref = ref_grounding_evaluator.GroundingEvaluator(
        prefixes=list(prefixes), filter_non_gt_boxes=butd_cls
    )
    with torch.no_grad():
        for p in prefixes:
            ref.evaluate(ep_t, p)

    ours = GroundingEvaluator(
        prefixes=prefixes, filter_non_gt_boxes=butd_cls
    )
    end_points = {
        k: jnp.asarray(d[k])
        for k in d
        if k.startswith(("last_", "proposal_", "proj_tokens"))
    }
    targets = {
        k: jnp.asarray(d[k])
        for k in (
            "center_label", "size_gts", "box_label_mask", "positive_map",
            "modify_positive_map", "pron_positive_map", "other_entity_map",
            "rel_positive_map", "auxi_entity_positive_map",
        )
    }
    hardness = {k: d[k] for k in ("is_view_dep", "is_hard", "is_unique")}
    inputs = {
        "det_boxes": jnp.asarray(d["all_detected_boxes"]),
        "det_mask": jnp.asarray(d["all_detected_bbox_label_mask"]),
    }
    ours.evaluate(end_points, targets, hardness=hardness, inputs=inputs)

    for key, ref_val in ref.dets.items():
        assert ours.dets[key] == ref_val, (key, ours.dets[key], ref_val)
    for key, ref_val in ref.gts.items():
        got = ours.gts[key]
        assert got == pytest.approx(ref_val, abs=1.0), (key, got, ref_val)


def test_hungarian_loss_gradient_parity(ref_losses):
    """d(total loss)/d(predictions) matches torch autograd through the
    reference compute_hungarian_loss — pins masking/normalizer gradients
    (focal, soft-token CE, GIoU, InfoNCE) that value checks can hide.
    The matcher assignment and KPS top-k are discrete on both sides."""
    d = _fabricate(seed=5)
    grad_keys = (
        ["seeds_obj_cls_logits", "proj_tokens"]
        + [
            f"{p}{k}"
            for p in ["proposal_", "last_"]
            + [f"{i}head_" for i in range(NUM_DEC - 1)]
            for k in ("center", "pred_size", "sem_cls_scores", "proj_queries")
        ]
    )

    # ---- torch side ----
    matcher = ref_losses.HungarianMatcher(
        cost_class=1, cost_bbox=0, cost_giou=2, soft_token=True
    )
    criterion = ref_losses.SetCriterion(
        matcher=matcher,
        losses=["boxes", "labels", "contrastive_align"],
        eos_coef=0.1,
        temperature=0.07,
    )
    ep_t = _ref_end_points(d, "scanrefer")
    leaves = {}
    for k in grad_keys:
        ep_t[k] = ep_t[k].clone().requires_grad_(True)
        leaves[k] = ep_t[k]
    loss, _ = ref_losses.compute_hungarian_loss(
        ep_t, NUM_DEC, criterion, query_points_obj_topk=TOPK
    )
    loss.backward()
    ref_grads = {
        k: (v.grad.numpy() if v.grad is not None else np.zeros(v.shape))
        for k, v in leaves.items()
    }

    # ---- ours ----
    cfg = SetCriterionConfig(
        num_decoder_layers=NUM_DEC, dataset="scanrefer",
        query_points_obj_topk=TOPK,
    )
    end_points, targets = _our_inputs(d)

    def total(diff_ep):
        ep = dict(end_points)
        ep.update(diff_ep)
        loss, _ = compute_hungarian_loss(cfg, ep, targets)
        return loss

    diff_ep = {k: end_points[k] for k in grad_keys if k in end_points}
    our_grads = jax.jit(jax.grad(total))(diff_ep)

    for k in grad_keys:
        want = ref_grads[k]
        if k == "seeds_obj_cls_logits":
            want = want.squeeze(1)  # ref holds (B, 1, K)
        got = np.asarray(our_grads[k], np.float32)
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(
            got, want, atol=max(2e-4 * scale, 1e-7), err_msg=k
        )
