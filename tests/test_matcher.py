"""Auction matcher vs scipy's exact Hungarian solver."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from eda_tpu.losses.matcher import auction_assign


def solve_np(cost, valid):
    """Exact per-row assignment cost via scipy."""
    total = 0.0
    assignments = []
    for b in range(cost.shape[0]):
        c = cost[b][:, valid[b]]
        rows, cols = linear_sum_assignment(c)
        total += c[rows, cols].sum()
        assignments.append((rows, cols))
    return total, assignments


def test_auction_matches_scipy_optimal_cost(rng):
    B, Q, G = 4, 32, 7
    cost = rng.normal(size=(B, Q, G)).astype(np.float32)
    valid = np.ones((B, G), bool)
    valid[0, 5:] = False
    valid[1, 2:] = False

    match = auction_assign(jnp.asarray(cost), jnp.asarray(valid))
    got_cost = 0.0
    for b in range(B):
        qs = np.asarray(match.match_q[b])[valid[b]]
        # one-to-one
        assert len(set(qs.tolist())) == valid[b].sum()
        got_cost += cost[b, qs, np.where(valid[b])[0]].sum()

    want_cost, _ = solve_np(cost, valid)
    # auction is eps-suboptimal: G * eps bound
    assert got_cost <= want_cost + G * 1e-3 + 1e-4


def test_auction_single_target_is_argmin(rng):
    B, Q = 3, 16
    cost = rng.normal(size=(B, Q, 1)).astype(np.float32)
    valid = np.ones((B, 1), bool)
    match = auction_assign(jnp.asarray(cost), jnp.asarray(valid))
    np.testing.assert_array_equal(
        np.asarray(match.match_q)[:, 0], cost[:, :, 0].argmin(1)
    )
    qm = np.asarray(match.query_matched)
    assert qm.sum() == B


def test_auction_all_padding_targets(rng):
    cost = rng.normal(size=(2, 8, 3)).astype(np.float32)
    valid = np.zeros((2, 3), bool)
    match = auction_assign(jnp.asarray(cost), jnp.asarray(valid))
    assert not np.asarray(match.query_matched).any()


def test_query_target_inverse(rng):
    B, Q, G = 2, 16, 5
    cost = rng.normal(size=(B, Q, G)).astype(np.float32)
    valid = np.ones((B, G), bool)
    match = auction_assign(jnp.asarray(cost), jnp.asarray(valid))
    mq = np.asarray(match.match_q)
    qt = np.asarray(match.query_target)
    qm = np.asarray(match.query_matched)
    for b in range(B):
        for g in range(G):
            q = mq[b, g]
            assert qm[b, q]
            assert qt[b, q] == g
