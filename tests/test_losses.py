"""Loss stack vs numpy transcriptions of the reference torch formulas.

Each oracle below is a line-by-line port of the corresponding function in
the reference ``models/losses.py`` (ragged, per-sample, numpy) — the batched
jnp implementation must reproduce it on cases where the optimal matching is
unambiguous.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eda_tpu.losses.criterion import (
    SetCriterionConfig,
    box_loss,
    kps_loss,
    pos_align_loss,
    sem_align_loss,
    sigmoid_focal_loss,
)
from eda_tpu.losses.matcher import MatchResult, auction_assign

B, Q, G, C, L = 2, 8, 3, 16, 16


def make_case(rng, n_valid=(2, 3)):
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    valid = np.zeros((B, G), bool)
    for b, n in enumerate(n_valid):
        valid[b, :n] = True

    def rand_map(p=0.2):
        m = (rng.uniform(size=(B, G, L)) < p).astype(np.float32)
        return m / np.maximum(m.sum(-1, keepdims=True), 1e-6)

    targets = {
        "center_label": rng.uniform(-1, 1, size=(B, G, 3)).astype(np.float32),
        "size_gts": rng.uniform(0.2, 1.0, size=(B, G, 3)).astype(np.float32),
        "box_label_mask": valid.astype(np.float32),
        "positive_map": rand_map(),
        "modify_positive_map": rand_map(),
        "pron_positive_map": rand_map(),
        "other_entity_map": rand_map(),
        "rel_positive_map": rand_map(),
        "text_lengths": np.array([L - 2, L - 4], np.int32),
    }
    # deterministic unambiguous matching: target g <-> query g
    match = MatchResult(
        match_q=jnp.asarray(np.tile(np.arange(G), (B, 1)).astype(np.int32)),
        target_valid=jnp.asarray(valid),
        query_matched=jnp.asarray(
            np.arange(Q)[None, :] < np.array(n_valid)[:, None]
        ),
        query_target=jnp.asarray(np.tile(np.arange(Q) % G, (B, 1)).astype(np.int32)),
    )
    num_boxes = float(valid.sum())
    return logits, targets, match, valid, num_boxes


def to_jnp(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


def log_softmax(x, axis=-1):
    x = x - x.max(axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis, keepdims=True))


def test_pos_align_matches_reference_formula(rng):
    cfg = SetCriterionConfig(dataset="scanrefer")
    logits, targets, match, valid, num_boxes = make_case(rng)

    got = float(
        pos_align_loss(cfg, jnp.asarray(logits), match, to_jnp(targets), num_boxes)
    )

    # oracle: reference losses.py:357-414
    logp = log_softmax(logits)
    wm, wa, wp, wr = cfg.pos_weights
    loss = 0.0
    for b in range(B):
        for q in range(Q):
            g = q  # identity match for matched queries
            if q < valid[b].sum():
                ts = (
                    wm * targets["positive_map"][b, g, :C]
                    + wa * targets["modify_positive_map"][b, g, :C]
                    + wp * targets["pron_positive_map"][b, g, :C]
                    + wr * targets["rel_positive_map"][b, g, :C]
                )
                w = 1.0
            else:
                ts = np.zeros(C)
                ts[-1] = 1.0
                w = cfg.eos_coef
            entropy = np.log(ts + 1e-6) * ts
            loss += w * (entropy - logp[b, q] * ts).sum()
    want = loss / num_boxes
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_box_loss_matches_reference_formula(rng):
    _, targets, match, valid, num_boxes = make_case(rng)
    pred = rng.uniform(-1, 1, size=(B, Q, 6)).astype(np.float32)
    pred[..., 3:] = np.abs(pred[..., 3:]) + 0.1

    got_bbox, got_giou = box_loss(jnp.asarray(pred), match, to_jnp(targets), num_boxes)

    from eda_tpu.ops.boxes import box_cxcyczwhd_to_xyzxyz, generalized_box_iou_3d

    l1, giou_sum = 0.0, 0.0
    for b in range(B):
        for g in range(G):
            if not valid[b, g]:
                continue
            src = pred[b, g]  # identity match
            tgt = np.concatenate(
                [targets["center_label"][b, g], targets["size_gts"][b, g]]
            )
            l1 += np.abs(src[:3] - tgt[:3]).sum() + 0.2 * np.abs(src[3:] - tgt[3:]).sum()
            gi = generalized_box_iou_3d(
                box_cxcyczwhd_to_xyzxyz(jnp.asarray(src[None])),
                box_cxcyczwhd_to_xyzxyz(jnp.asarray(tgt[None])),
            )[0, 0]
            giou_sum += 1.0 - float(gi)
    np.testing.assert_allclose(float(got_bbox), l1 / num_boxes, rtol=1e-4)
    np.testing.assert_allclose(float(got_giou), giou_sum / num_boxes, rtol=1e-4)


def test_sem_align_matches_reference_formula(rng):
    cfg = SetCriterionConfig(dataset="scanrefer")
    _, targets, match, valid, num_boxes = make_case(rng)
    pq = rng.normal(size=(B, Q, 8)).astype(np.float32)
    pt = rng.normal(size=(B, L, 8)).astype(np.float32)
    pq /= np.linalg.norm(pq, axis=-1, keepdims=True)
    pt /= np.linalg.norm(pt, axis=-1, keepdims=True)

    got = float(
        sem_align_loss(
            cfg, jnp.asarray(pq), jnp.asarray(pt), match, to_jnp(targets), num_boxes
        )
    )

    # oracle: reference losses.py:449-581 (ragged transcription)
    logits = np.einsum("bqd,bld->bql", pq, pt) / cfg.temperature
    inds = targets["text_lengths"] - 1

    pos = np.zeros((B, Q, L))
    for b in range(B):
        pos[b, :, inds[b]] = 0.5
        pos[b, :, inds[b] - 1] = 0.5
    modi = np.zeros((B, Q, L))
    pron = np.zeros((B, Q, L))
    other = np.zeros((B, Q, L))
    rel = np.zeros((B, Q, L))
    for b in range(B):
        for g in range(int(valid[b].sum())):
            q = g
            pos[b, q] = targets["positive_map"][b, g, :L]
            modi[b, q] = targets["modify_positive_map"][b, g, :L]
            pron[b, q] = targets["pron_positive_map"][b, g, :L]
            other[b, q] = targets["other_entity_map"][b, g, :L]
            rel[b, q] = targets["rel_positive_map"][b, g, :L]
    posb, modib, pronb, otherb, relb = (m > 0 for m in (pos, modi, pron, other, rel))

    mask = np.full((B, Q), cfg.eos_coef)
    tmask = np.full((B, L), cfg.eos_coef)
    for b in range(B):
        mask[b, : int(valid[b].sum())] = 1.0
        tmask[b, inds[b]] = 1.0

    positive_logits = np.where(posb, -logits, 0.0)
    negative_logits = logits
    other_neg = np.where(otherb, logits, 0.0)
    modi_pos = np.where(modib, -logits, 0.0)
    pron_pos = np.where(pronb, -logits, 0.0)
    rel_pos = np.where(relb, -logits, 0.0)

    def lse(x, axis):
        m = x.max(axis, keepdims=True)
        return (m + np.log(np.exp(x - m).sum(axis, keepdims=True))).squeeze(axis)

    nb_pos = posb.sum(2) + 1e-6
    nb_modi = modib.sum(2) + 1e-6
    nb_pron = pronb.sum(2) + 1e-6
    nb_rel = relb.sum(2) + 1e-6
    boxes_with_pos = posb.any(2)
    b2t = (
        positive_logits.sum(2) / nb_pos
        + 0.2 * modi_pos.sum(2) / nb_modi
        + 0.2 * pron_pos.sum(2) / nb_pron
        + 0.1 * rel_pos.sum(2) / nb_rel
        + lse(negative_logits + other_neg, 2)
    )
    b2t = np.where(boxes_with_pos, b2t, 0.0)
    b2t_loss = (b2t * mask).sum()

    tokens_with_pos = (posb | modib | pronb | relb).any(1)
    tmask[posb.any(1)] = 1.0
    tmask[modib.any(1)] = 0.2
    tmask[pronb.any(1)] = 0.2
    tmask[relb.any(1)] = 0.1
    for b in range(B):
        tmask[b, inds[b] - 1] = 0.1
    pos_term = positive_logits.sum(1) + modi_pos.sum(1) + pron_pos.sum(1) + rel_pos.sum(1)
    # reference nb_pos_obj sums RAW fractional modi/pron/rel maps; only the
    # main map is binarized (losses.py:570-571 vs :474)
    nb_obj = posb.sum(1) + modi.sum(1) + pron.sum(1) + rel.sum(1) + 1e-6
    entropy = -np.log(nb_obj + 1e-6) / nb_obj
    t2b = entropy + pos_term / nb_obj + lse(negative_logits, 1)
    t2b = np.where(tokens_with_pos, t2b, 0.0)
    t2b_loss = (t2b * tmask).sum()

    want = (b2t_loss + t2b_loss) / 2.0 / num_boxes
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_kps_loss_matches_reference_formula(rng):
    K, N, topk = 16, 64, 3
    seed_inds = rng.permutation(N)[:K][None].repeat(B, 0).astype(np.int32)
    seed_xyz = rng.uniform(-1, 1, size=(B, K, 3)).astype(np.float32)
    logits = rng.normal(size=(B, K)).astype(np.float32)
    point_instance = rng.integers(-1, G, size=(B, N)).astype(np.int32)
    valid = np.zeros((B, G), np.float32)
    valid[:, :2] = 1

    end_points = {
        "seed_inds": jnp.asarray(seed_inds),
        "seed_xyz": jnp.asarray(seed_xyz),
        "seeds_obj_cls_logits": jnp.asarray(logits),
    }
    targets = {
        "center_label": jnp.asarray(rng.uniform(-1, 1, size=(B, G, 3)).astype(np.float32)),
        "size_gts": jnp.asarray(rng.uniform(0.3, 1, size=(B, G, 3)).astype(np.float32)),
        "box_label_mask": jnp.asarray(valid),
        "point_instance_label": jnp.asarray(point_instance),
    }
    got = float(kps_loss(end_points, targets, topk))

    # oracle: reference losses.py:166-228
    gt_center = np.asarray(targets["center_label"])
    gt_size = np.asarray(targets["size_gts"])
    obj_assign = np.take_along_axis(point_instance, seed_inds, 1)
    fg = obj_assign >= 0
    obj_assign2 = np.where(fg, obj_assign, G - 1)
    objectness = np.zeros((B, K))
    for b in range(B):
        for g in range(G):
            delta = (seed_xyz[b] - gt_center[b, g]) / (gt_size[b, g] + 1e-6)
            dist = np.sqrt((delta**2).sum(-1) + 1e-6)
            dist = np.where(obj_assign2[b] == g, dist, 100.0)
            top = np.argsort(dist)[:topk]
            if valid[b, g]:
                objectness[b, top] = 1
    objectness[~fg] = 0
    w = np.ones((B, K)) / K
    p = 1 / (1 + np.exp(-logits))
    alpha_w = objectness * 0.25 + (1 - objectness) * 0.75
    pt = objectness * (1 - p) + (1 - objectness) * p
    bce = np.maximum(logits, 0) - logits * objectness + np.log1p(np.exp(-np.abs(logits)))
    want = (alpha_w * pt**2 * bce * w).sum() / B
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_focal_loss_basics():
    logits = jnp.asarray([[10.0, -10.0]])
    targets = jnp.asarray([[1.0, 0.0]])
    w = jnp.ones((1, 2))
    loss = np.asarray(sigmoid_focal_loss(logits, targets, w))
    assert (loss < 1e-3).all()  # confident correct predictions -> ~0 loss


def test_full_loss_runs_and_is_finite(rng):
    """Smoke: compute_hungarian_loss end-to-end on fabricated end_points."""
    from eda_tpu.losses.criterion import compute_hungarian_loss

    cfg = SetCriterionConfig(num_decoder_layers=2, dataset="scanrefer")
    _, targets, _, valid, _ = make_case(rng)
    targets["point_instance_label"] = rng.integers(-1, G, size=(B, 64)).astype(np.int32)

    end_points = {
        "seed_inds": jnp.asarray(rng.integers(0, 64, size=(B, 12)).astype(np.int32)),
        "seed_xyz": jnp.asarray(rng.uniform(-1, 1, size=(B, 12, 3)).astype(np.float32)),
        "seeds_obj_cls_logits": jnp.asarray(rng.normal(size=(B, 12)).astype(np.float32)),
        "proj_tokens": jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32)),
    }
    for prefix in ["proposal_", "last_", "0head_"]:
        end_points[f"{prefix}center"] = jnp.asarray(
            rng.uniform(-1, 1, size=(B, Q, 3)).astype(np.float32)
        )
        end_points[f"{prefix}pred_size"] = jnp.asarray(
            rng.uniform(0.1, 1, size=(B, Q, 3)).astype(np.float32)
        )
        end_points[f"{prefix}sem_cls_scores"] = jnp.asarray(
            rng.normal(size=(B, Q, C)).astype(np.float32)
        )
        end_points[f"{prefix}proj_queries"] = jnp.asarray(
            rng.normal(size=(B, Q, 8)).astype(np.float32)
        )
    loss, metrics = compute_hungarian_loss(cfg, end_points, to_jnp(targets))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["loss_sem_align"]))
    assert float(metrics["query_points_generation_loss"]) >= 0

    # num_replicas reproduces DDP gradient averaging: matched losses scale
    # by 1/W, the KPS loss (a batch mean in the reference) does not
    cfg4 = SetCriterionConfig(
        num_decoder_layers=2, dataset="scanrefer", num_replicas=4
    )
    loss4, metrics4 = compute_hungarian_loss(cfg4, end_points, to_jnp(targets))
    np.testing.assert_allclose(
        float(metrics4["loss_ce"]), float(metrics["loss_ce"]) / 4, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics4["loss_giou"]), float(metrics["loss_giou"]) / 4, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics4["query_points_generation_loss"]),
        float(metrics["query_points_generation_loss"]),
        rtol=1e-6,
    )
