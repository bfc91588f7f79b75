"""Batched Hungarian matching on device via the auction algorithm.

The reference ships the (B, Q, G) cost matrix to the CPU and runs scipy's
``linear_sum_assignment`` per batch row — 14 host round-trips per training
step (7 prefixes x main/auxi matches, ``models/losses.py:323-329``). That
host sync is the single biggest structural inefficiency in the reference's
step; here the assignment solves on the TPU inside the jitted step.

We use a parallel (Jacobi) forward auction: targets bid for queries with
increment (best - second_best + eps); the highest bidder per query wins and
prices rise monotonically. With G <= 132 targets and Q = 256 queries per
scene the per-iteration work is a few (B, G, Q) element-wise passes — VPU
noise. eps bounds the suboptimality at G*eps, far below the cost scale of
the soft-token/GIoU costs; for the common grounding case (1-2 targets) the
auction converges in 1-2 iterations and is exact.

The returned assignment is dense and padded: per-target matched query index
plus masks, which is what the fully-batched criterion consumes (no ragged
per-sample index tuples as in the reference).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG = -1e9


class MatchResult(NamedTuple):
    """Dense match: for each (padded) target, its assigned query.

    match_q: (B, G) int32 — query index for each target (garbage where
        ``target_valid`` is False).
    target_valid: (B, G) bool — real (non-padding) targets.
    query_matched: (B, Q) bool — True for queries that own a real target.
    query_target: (B, Q) int32 — the target owned by each query (garbage
        where ``query_matched`` is False).
    iters: () int32 — auction rounds used (diagnostic; None when the result
        was constructed by hand).
    """

    match_q: jnp.ndarray
    target_valid: jnp.ndarray
    query_matched: jnp.ndarray
    query_target: jnp.ndarray
    iters: jnp.ndarray = None


def _auction_assign(
    cost: jnp.ndarray,
    target_valid: jnp.ndarray,
    eps: float = 1e-4,
    max_iters: int = 512,
) -> MatchResult:
    """Minimize sum of cost[b, match_q[b, g], g] over one-to-one assignments.

    Args:
        cost: (B, Q, G) float cost; only columns with target_valid count.
        target_valid: (B, G) bool.
        eps: bidding increment floor (suboptimality bound is G * eps).
        max_iters: safety cap on auction rounds.

    Returns:
        MatchResult with a complete assignment of every valid target.
    """
    B, Q, G = cost.shape
    value = -jnp.swapaxes(cost, 1, 2)  # (B, G, Q), maximize
    value = jnp.where(target_valid[:, :, None], value, _NEG)

    def cond(state):
        owner, prices, it = state
        # Unassigned valid targets: targets not owned by any query.
        owned = jax.nn.one_hot(owner, G, dtype=jnp.float32).sum(1) > 0  # (B, G)
        unassigned = target_valid & ~owned
        return jnp.logical_and(jnp.any(unassigned), it < max_iters)

    def body(state):
        owner, prices, it = state
        owned = jax.nn.one_hot(owner, G, dtype=jnp.float32).sum(1) > 0  # (B, G)
        unassigned = target_valid & ~owned  # (B, G)

        v = value - prices[:, None, :]  # (B, G, Q)
        w1 = jnp.max(v, axis=-1)  # (B, G)
        i1 = jnp.argmax(v, axis=-1)  # (B, G)
        v2 = jnp.where(jax.nn.one_hot(i1, Q, dtype=bool), _NEG, v)
        w2 = jnp.max(v2, axis=-1)
        bids = prices[jnp.arange(B)[:, None], i1] + (w1 - w2) + eps  # (B, G)

        # Highest bid per query wins (ties -> lowest target index).
        bid_mat = jnp.where(
            jax.nn.one_hot(i1, Q, dtype=bool) & unassigned[:, :, None],
            bids[:, :, None],
            _NEG,
        )  # (B, G, Q)
        win_bid = jnp.max(bid_mat, axis=1)  # (B, Q)
        win_t = jnp.argmax(bid_mat, axis=1).astype(jnp.int32)  # (B, Q)
        has_bid = win_bid > _NEG / 2

        prices = jnp.where(has_bid, win_bid, prices)
        owner = jnp.where(has_bid, win_t, owner)
        # A target can win at most one query per round (it bid on exactly one),
        # and winning evicts the previous owner implicitly via the owner array.
        return owner, prices, it + 1

    owner0 = jnp.full((B, Q), -1, jnp.int32)
    prices0 = jnp.zeros((B, Q), jnp.float32)
    owner, _, iters = jax.lax.while_loop(
        cond, body, (owner0, prices0, jnp.int32(0))
    )

    # owner[b, q] = target or -1. Derive per-target query index.
    own_onehot = (
        owner[:, :, None] == jnp.arange(G)[None, None, :]
    )  # (B, Q, G)
    match_q = jnp.argmax(own_onehot, axis=1).astype(jnp.int32)  # (B, G)
    query_matched = (owner >= 0) & jnp.take_along_axis(
        jnp.concatenate([target_valid, jnp.zeros((B, 1), bool)], 1),
        jnp.clip(owner, 0, G),
        axis=1,
    )
    return MatchResult(
        match_q=match_q,
        target_valid=target_valid,
        query_matched=query_matched,
        query_target=jnp.clip(owner, 0, G - 1),
        iters=iters,
    )


# Jitted entry point for direct (non-traced) callers; inside larger jitted
# graphs — and especially under vmap — use the plain ``_auction_assign``:
# a nested jit under vmap can deadlock the compilation dispatch.
auction_assign = functools.partial(jax.jit, static_argnames=("max_iters",))(
    _auction_assign
)


def hungarian_match(
    pred_logits: jnp.ndarray,
    pred_boxes_xyzxyz: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_boxes_xyzxyz: jnp.ndarray,
    positive_map: jnp.ndarray,
    target_valid: jnp.ndarray,
    cost_class: float = 1.0,
    cost_bbox: float = 0.0,
    cost_giou: float = 2.0,
) -> MatchResult:
    """EDA matching costs + auction solve (reference ``losses.py:261-336``).

    cost = cost_class * (-softmax(logits) . positive_map)
         + cost_bbox * L1(pred, gt)            (weight 0 in reference runs)
         + cost_giou * (-GIoU(pred, gt))

    Args:
        pred_logits: (B, Q, C) soft-token logits.
        pred_boxes_xyzxyz / pred_boxes: (B, Q, 6) corner / center-size boxes.
        gt_boxes / gt_boxes_xyzxyz: (B, G, 6).
        positive_map: (B, G, C) row-normalized token maps.
        target_valid: (B, G) bool.
    """
    from eda_tpu.ops.boxes import generalized_box_iou_3d

    prob = jax.nn.softmax(pred_logits, axis=-1)  # (B, Q, C)
    c_class = -jnp.einsum("bqc,bgc->bqg", prob, positive_map)
    c_giou = -generalized_box_iou_3d(pred_boxes_xyzxyz, gt_boxes_xyzxyz)
    cost = cost_class * c_class + cost_giou * c_giou
    if cost_bbox:
        c_bbox = jnp.sum(
            jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]), axis=-1
        )
        cost = cost + cost_bbox * c_bbox
    return _auction_assign(cost, target_valid)
