"""EDA's loss stack: KPS, position alignment, boxes, semantic alignment.

Fully-batched, padded-and-masked re-derivation of the reference
``models/losses.py``. The reference builds ragged per-sample target dicts and
loops; here every loss consumes the dense ``MatchResult`` plus padded target
arrays, so the whole 7-prefix loss stack jits into the training step.

Loss-by-loss provenance:

* KPS objectness     — ``compute_points_obj_cls_loss_hard_topk`` (losses.py:166-228)
* position alignment — ``SetCriterion.loss_pos_align`` (losses.py:357-414)
* box L1 + GIoU      — ``SetCriterion.loss_boxes`` (losses.py:417-444)
* semantic alignment — ``SetCriterion.loss_sem_align`` (losses.py:449-581)
* totals             — ``compute_hungarian_loss`` (losses.py:650-739)

Deliberate deviations from the reference:
* the auxiliary-object match (``losses.py:622-630``) is not computed: its
  result ``auxi_indices`` is threaded through but never read by any loss in
  the reference, so it is dead compute;
* ``num_boxes`` needs no explicit all_reduce (losses.py:637-638): under a
  global-view pjit step the sum over the sharded batch axis is already
  global. DDP's extra 1/world_size gradient averaging on the matched losses
  is reproduced via ``SetCriterionConfig.num_replicas``.

Target arrays expected in ``targets`` (padded to G = max objects, L = token
positions; built by the data pipeline exactly like the reference's
``end_points`` GT keys, ``losses.py:657-684``):

    center_label (B, G, 3), size_gts (B, G, 3), box_label_mask (B, G),
    positive_map / modify_positive_map / pron_positive_map /
    other_entity_map / rel_positive_map (B, G, L),
    point_instance_label (B, N), text_lengths (B,)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from eda_tpu.losses.matcher import MatchResult, hungarian_match
from eda_tpu.models.grounder import decoder_prefixes
from eda_tpu.ops.boxes import box_cxcyczwhd_to_xyzxyz, generalized_box_iou_3d


@dataclasses.dataclass(frozen=True)
class SetCriterionConfig:
    cost_class: float = 1.0
    cost_bbox: float = 0.0
    cost_giou: float = 2.0
    eos_coef: float = 0.1
    temperature: float = 0.07
    query_points_obj_topk: int = 4
    num_decoder_layers: int = 6
    dataset: str = "scanrefer"  # scanrefer | sr3d | nr3d | scannet
    use_contrastive_align: bool = True
    # Data-parallel width used to reproduce torch DDP's gradient averaging:
    # the reference all_reduces num_boxes (losses.py:637-638) and then DDP
    # divides gradients by world_size, so the effective Hungarian losses
    # (ce/bbox/giou/sem) carry an extra 1/world_size that the KPS loss (a
    # per-replica batch mean) does not. Multiplying num_boxes by the replica
    # count reproduces the published multi-GPU recipes' loss balance exactly
    # at any mesh width; 1 = the single-GPU recipe.
    num_replicas: int = 1

    @property
    def pos_weights(self) -> Tuple[float, float, float, float]:
        """(main, attribute, pronoun, relation) mix (losses.py:383-386)."""
        if self.dataset == "sr3d":
            return (0.625, 0.125, 0.125, 0.125)
        return (0.6, 0.2, 0.2, 0.1)

    @property
    def loss_weight(self) -> float:
        """ce / sem-align down-weight, 0.5 for ScanRefer (losses.py:721-723)."""
        return 0.5 if self.dataset == "scanrefer" else 1.0


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Per-element focal BCE (reference losses.py:100-164)."""
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1 - p) + (1 - targets) * p
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return alpha_w * (pt**gamma) * bce * weights


def kps_loss(end_points: dict, targets: dict, topk: int) -> jnp.ndarray:
    """Seed objectness loss with hard top-k positives (losses.py:166-228)."""
    seed_inds = end_points["seed_inds"].astype(jnp.int32)  # (B, K)
    seed_xyz = end_points["seed_xyz"]  # (B, K, 3)
    logits = end_points["seeds_obj_cls_logits"]  # (B, K)
    gt_center = targets["center_label"]  # (B, G, 3)
    gt_size = targets["size_gts"]  # (B, G, 3)
    box_mask = targets["box_label_mask"].astype(jnp.float32)  # (B, G)
    B, K = seed_inds.shape
    G = gt_center.shape[1]

    point_instance = targets["point_instance_label"]  # (B, N)
    obj_assignment = jnp.take_along_axis(point_instance, seed_inds, axis=1)  # (B, K)
    fg = obj_assignment >= 0
    obj_assignment = jnp.where(fg, obj_assignment, G - 1)

    # Size-normalized distance of each seed to each GT center; non-assigned
    # pairs get 100 (losses.py:185-192).
    delta = seed_xyz[:, :, None, :] - gt_center[:, None, :, :]  # (B, K, G, 3)
    delta = delta / (gt_size[:, None, :, :] + 1e-6)
    dist = jnp.sqrt(jnp.sum(delta**2, axis=-1) + 1e-6)  # (B, K, G)
    assigned = obj_assignment[:, :, None] == jnp.arange(G)[None, None, :]
    dist = jnp.where(assigned, dist, 100.0)
    dist = jnp.swapaxes(dist, 1, 2)  # (B, G, K)

    # topk closest seeds per GT are positives; padding GTs scatter out of
    # range and are dropped (the reference's index -1 wrap, losses.py:197-212).
    _, topk_inds = jax.lax.top_k(-dist, topk)  # (B, G, topk)
    valid = box_mask[:, :, None] > 0
    scatter_inds = jnp.where(valid, topk_inds, K)  # K = out of range -> drop
    objectness = jnp.zeros((B, K), jnp.float32)
    objectness = objectness.at[
        jnp.arange(B)[:, None, None], scatter_inds
    ].set(1.0, mode="drop")
    objectness = jnp.where(fg, objectness, 0.0)  # background seeds -> 0

    cls_weights = jnp.ones((B, K), jnp.float32)
    cls_weights = cls_weights / jnp.maximum(
        jnp.sum(cls_weights, axis=1, keepdims=True), 1.0
    )
    loss = sigmoid_focal_loss(logits, objectness, cls_weights)
    return jnp.sum(loss) / B


def _gather_per_query(match: MatchResult, per_target: jnp.ndarray) -> jnp.ndarray:
    """Scatter per-target rows onto their matched queries.

    per_target: (B, G, ...) -> (B, Q, ...); unmatched queries get zeros.
    """
    gathered = jnp.take_along_axis(
        per_target,
        match.query_target[:, :, None].astype(jnp.int32),
        axis=1,
    )
    return jnp.where(match.query_matched[:, :, None], gathered, 0.0)


def pos_align_loss(
    cfg: SetCriterionConfig,
    pred_logits: jnp.ndarray,
    match: MatchResult,
    targets: dict,
    num_boxes: jnp.ndarray,
) -> jnp.ndarray:
    """Dense position-alignment CE over soft token maps (losses.py:357-414)."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)  # (B, Q, C)
    C = pred_logits.shape[-1]
    wm, wa, wp, wr = cfg.pos_weights
    weighted = (
        targets["positive_map"][..., :C] * wm
        + targets["modify_positive_map"][..., :C] * wa
        + targets["pron_positive_map"][..., :C] * wp
        + targets["rel_positive_map"][..., :C] * wr
    )  # (B, G, C)
    tgt_per_query = _gather_per_query(match, weighted)  # (B, Q, C)
    not_mentioned = jax.nn.one_hot(C - 1, C)[None, None, :]
    target_sim = jnp.where(
        match.query_matched[:, :, None], tgt_per_query, not_mentioned
    )

    entropy = jnp.log(target_sim + 1e-6) * target_sim
    loss_ce = jnp.sum(entropy - logp * target_sim, axis=-1)  # (B, Q)
    eos = jnp.where(match.query_matched, 1.0, cfg.eos_coef)
    return jnp.sum(loss_ce * eos) / num_boxes


def box_loss(
    pred_boxes: jnp.ndarray,
    match: MatchResult,
    targets: dict,
    num_boxes: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L1 (center + 0.2*size) and GIoU on matched pairs (losses.py:417-444)."""
    gt_boxes = jnp.concatenate([targets["center_label"], targets["size_gts"]], -1)
    src = jnp.take_along_axis(
        pred_boxes, match.match_q[:, :, None].astype(jnp.int32), axis=1
    )  # (B, G, 6)
    valid = match.target_valid
    l1 = jnp.abs(src[..., :3] - gt_boxes[..., :3]) + 0.2 * jnp.abs(
        src[..., 3:] - gt_boxes[..., 3:]
    )
    loss_bbox = jnp.sum(jnp.where(valid[..., None], l1, 0.0)) / num_boxes

    giou = generalized_box_iou_3d(
        box_cxcyczwhd_to_xyzxyz(src).reshape(-1, 1, 6),
        box_cxcyczwhd_to_xyzxyz(gt_boxes).reshape(-1, 1, 6),
    ).reshape(valid.shape)
    loss_giou = jnp.sum(jnp.where(valid, 1.0 - giou, 0.0)) / num_boxes
    return loss_bbox, loss_giou


def sem_align_loss(
    cfg: SetCriterionConfig,
    proj_queries: jnp.ndarray,
    proj_tokens: jnp.ndarray,
    match: MatchResult,
    targets: dict,
    num_boxes: jnp.ndarray,
) -> jnp.ndarray:
    """Bidirectional InfoNCE over decoupled spans (losses.py:449-581)."""
    logits = (
        jnp.einsum("bqd,bld->bql", proj_queries, proj_tokens) / cfg.temperature
    )  # (B, Q, L)
    B, Q, L = logits.shape
    eos_ind = targets["text_lengths"].astype(jnp.int32) - 1  # (B,) index of </s>

    # Main map: unmatched queries align to the final ' . not mentioned'
    # tokens (last two positions get 0.5, losses.py:465-467).
    nm = (
        jax.nn.one_hot(eos_ind, L) * 0.5 + jax.nn.one_hot(eos_ind - 1, L) * 0.5
    )[:, None, :]
    main_f = _gather_per_query(match, targets["positive_map"][..., :L])
    positive_map = (
        jnp.where(match.query_matched[:, :, None], main_f, nm) > 0
    )  # (B, Q, L) bool
    # Raw row-normalized fractional maps: the reference binarizes only the
    # main map; modi/pron/rel stay float and their raw values feed the
    # text->object normalizer nb_pos_obj (losses.py:570-571), while the
    # binarized versions select logits (losses.py:521-524).
    modi_f = _gather_per_query(match, targets["modify_positive_map"][..., :L])
    pron_f = _gather_per_query(match, targets["pron_positive_map"][..., :L])
    rel_f = _gather_per_query(match, targets["rel_positive_map"][..., :L])
    modi_map = modi_f > 0
    pron_map = pron_f > 0
    other_map = _gather_per_query(match, targets["other_entity_map"][..., :L]) > 0
    rel_map = rel_f > 0

    mask = jnp.where(match.query_matched, 1.0, cfg.eos_coef)  # (B, Q)

    neg_logits = logits
    pos_logits = jnp.where(positive_map, -logits, 0.0)
    modi_pos = jnp.where(modi_map, -logits, 0.0)
    pron_pos = jnp.where(pron_map, -logits, 0.0)
    rel_pos = jnp.where(rel_map, -logits, 0.0)
    other_neg = jnp.where(other_map, logits, 0.0)

    nb_pos = positive_map.sum(-1) + 1e-6
    nb_modi = modi_map.sum(-1) + 1e-6
    nb_pron = pron_map.sum(-1) + 1e-6
    nb_rel = rel_map.sum(-1) + 1e-6

    # ---- object -> text (losses.py:534-550) ----
    boxes_with_pos = positive_map.any(-1)
    neg_term = jax.nn.logsumexp(neg_logits + other_neg, axis=-1)  # (B, Q)
    box_to_token = (
        pos_logits.sum(-1) / nb_pos
        + 0.2 * modi_pos.sum(-1) / nb_modi
        + 0.2 * pron_pos.sum(-1) / nb_pron
        + 0.1 * rel_pos.sum(-1) / nb_rel
        + neg_term
    )
    box_to_token = jnp.where(boxes_with_pos, box_to_token, 0.0)
    box_to_token_loss = jnp.sum(box_to_token * mask)

    # ---- text -> object (losses.py:554-577) ----
    tokens_with_pos = (positive_map | modi_map | pron_map | rel_map).any(1)  # (B, L)
    # tmask build order matters: later assignments overwrite (losses.py:509-560).
    tmask = jnp.full((B, L), cfg.eos_coef)
    tmask = jnp.where(jax.nn.one_hot(eos_ind, L, dtype=bool), 1.0, tmask)
    tmask = jnp.where(positive_map.any(1), 1.0, tmask)
    tmask = jnp.where(modi_map.any(1), 0.2, tmask)
    tmask = jnp.where(pron_map.any(1), 0.2, tmask)
    tmask = jnp.where(rel_map.any(1), 0.1, tmask)
    tmask = jnp.where(jax.nn.one_hot(eos_ind - 1, L, dtype=bool), 0.1, tmask)

    pos_term = (
        pos_logits.sum(1) + modi_pos.sum(1) + pron_pos.sum(1) + rel_pos.sum(1)
    )  # (B, L)
    neg_term = jax.nn.logsumexp(neg_logits, axis=1)  # (B, L)
    nb_obj = (
        positive_map.sum(1) + modi_f.sum(1) + pron_f.sum(1) + rel_f.sum(1)
        + 1e-6
    )
    entropy = -jnp.log(nb_obj + 1e-6) / nb_obj
    token_to_box = entropy + pos_term / nb_obj + neg_term
    token_to_box = jnp.where(tokens_with_pos, token_to_box, 0.0)
    token_to_box_loss = jnp.sum(token_to_box * tmask)

    return (box_to_token_loss + token_to_box_loss) / 2.0 / num_boxes


def compute_hungarian_loss(
    cfg: SetCriterionConfig, end_points: dict, targets: dict
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss over all prediction prefixes (losses.py:650-739).

    The reference loops SetCriterion over 7 prefixes; here the per-prefix
    predictions are stacked on a leading axis and the whole match+loss block
    runs once under vmap — one compiled matcher/loss instance instead of 7
    (a large compile-time and scheduling win; numerics are identical).

    Returns (scalar loss, metrics dict). ``end_points`` is the grounder
    output; ``targets`` as documented in the module docstring.
    """
    prefixes = decoder_prefixes(cfg.num_decoder_layers)
    gt_boxes = jnp.concatenate([targets["center_label"], targets["size_gts"]], -1)
    gt_xyzxyz = box_cxcyczwhd_to_xyzxyz(gt_boxes)
    target_valid = targets["box_label_mask"] > 0

    num_boxes = jnp.maximum(
        jnp.sum(target_valid.astype(jnp.float32)), 1.0
    ) * float(cfg.num_replicas)

    pred_boxes_p = jnp.stack(
        [
            jnp.concatenate(
                [end_points[f"{p}center"], end_points[f"{p}pred_size"]], -1
            )
            for p in prefixes
        ]
    )  # (P, B, Q, 6)
    pred_logits_p = jnp.stack(
        [end_points[f"{p}sem_cls_scores"] for p in prefixes]
    )  # (P, B, Q, C)
    if cfg.use_contrastive_align:
        proj_queries_p = jnp.stack(
            [end_points[f"{p}proj_queries"] for p in prefixes]
        )  # (P, B, Q, D)
    else:
        proj_queries_p = jnp.zeros(pred_logits_p.shape[:3] + (1,))

    pmap_c = targets["positive_map"][..., : pred_logits_p.shape[-1]]

    def per_prefix(pred_boxes, pred_logits, proj_queries):
        match = hungarian_match(
            pred_logits,
            box_cxcyczwhd_to_xyzxyz(pred_boxes),
            pred_boxes,
            gt_boxes,
            gt_xyzxyz,
            pmap_c,
            target_valid,
            cost_class=cfg.cost_class,
            cost_bbox=cfg.cost_bbox,
            cost_giou=cfg.cost_giou,
        )
        ce = pos_align_loss(cfg, pred_logits, match, targets, num_boxes)
        bbox, giou = box_loss(pred_boxes, match, targets, num_boxes)
        if cfg.use_contrastive_align:
            sem = sem_align_loss(
                cfg, proj_queries, end_points["proj_tokens"], match, targets,
                num_boxes,
            )
        else:
            sem = jnp.zeros(())
        return ce, bbox, giou, sem

    ce_p, bbox_p, giou_p, sem_p = jax.vmap(per_prefix)(
        pred_boxes_p, pred_logits_p, proj_queries_p
    )

    metrics: Dict[str, jnp.ndarray] = {}
    for i, prefix in enumerate(prefixes):
        metrics[f"{prefix}loss_ce"] = ce_p[i]
        metrics[f"{prefix}loss_bbox"] = bbox_p[i]
        metrics[f"{prefix}loss_giou"] = giou_p[i]
        if cfg.use_contrastive_align:
            metrics[f"{prefix}loss_sem_align"] = sem_p[i]
    loss_ce = jnp.sum(ce_p)
    loss_bbox = jnp.sum(bbox_p)
    loss_giou = jnp.sum(giou_p)
    loss_sem = jnp.sum(sem_p)

    kps = kps_loss(end_points, targets, cfg.query_points_obj_topk)

    w = cfg.loss_weight
    loss = 8.0 * kps + (1.0 / (cfg.num_decoder_layers + 1)) * (
        w * loss_ce + 5.0 * loss_bbox + loss_giou + w * loss_sem
    )
    metrics.update(
        loss_ce=loss_ce,
        loss_bbox=loss_bbox,
        loss_giou=loss_giou,
        loss_sem_align=loss_sem,
        query_points_generation_loss=kps,
        loss=loss,
    )
    return loss, metrics
