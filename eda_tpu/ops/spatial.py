"""Gather-free spatial reordering for point clouds.

XLA TPU lowers generic row gathers to serial scalar loops — a (8, 131k)-index
gather over a 50k-point table costs ~1 s on v5e, and the reference's
gather-everything design (``group_points_gpu.cu``) is therefore unusable on
TPU. This module provides the TPU-native alternative: points are reordered by
spatial cell with **multi-operand ``lax.sort``** (keys + payload sorted
together — no gather materializes), after which any point's neighborhood
within radius r is (with high probability) a *contiguous window* of the
sorted array. Neighborhood ops then stream contiguous slices, which TPUs
love, instead of random rows, which they hate.

Used by the fused set-abstraction kernel (``ops/pallas/sa_fused.py``) and
reusable for any neighborhood op.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SortedScene(NamedTuple):
    """A spatially sorted point set.

    keys: (B, N) int32 cell keys, ascending per row.
    xyz: (B, N, 3) coordinates in sorted order.
    features: (B, N, C) features in sorted order (C may be 0).
    perm: (B, N) int32 original index of each sorted position (for mapping
        results back to input order when needed).
    """

    keys: jnp.ndarray
    xyz: jnp.ndarray
    features: jnp.ndarray
    perm: jnp.ndarray


def cell_keys(
    xyz: jnp.ndarray, cell_size: float, origin: float = -50.0, grid: int = 1024
) -> jnp.ndarray:
    """Row-major spatial cell key per point.

    The x cell is the major digit, so sorted order groups x-slabs; a ball of
    radius ~cell_size spans a contiguous-ish key range. ``grid`` bounds the
    cells per axis (clipped); the fixed origin keeps keys positive.

    Args:
        xyz: (..., 3).

    Returns:
        (...,) int32 keys.
    """
    cells = jnp.clip(
        jnp.floor((xyz - origin) / cell_size).astype(jnp.int32), 0, grid - 1
    )
    return (cells[..., 0] * grid + cells[..., 1]) * grid + cells[..., 2]


@functools.partial(jax.jit, static_argnames=("cell_size",))
def sort_by_cell(
    xyz: jnp.ndarray, features: jnp.ndarray, cell_size: float
) -> SortedScene:
    """Sort points (and payload) by spatial cell without any gather.

    Args:
        xyz: (B, N, 3); features: (B, N, C) (C can be 0).

    Returns:
        SortedScene.
    """
    B, N, _ = xyz.shape
    keys = cell_keys(xyz, cell_size)
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    operands = [keys, iota, xyz[..., 0], xyz[..., 1], xyz[..., 2]] + [
        features[..., c] for c in range(features.shape[-1])
    ]
    sorted_ops = jax.lax.sort(operands, dimension=1, num_keys=1)
    skeys, sperm = sorted_ops[0], sorted_ops[1]
    sxyz = jnp.stack(sorted_ops[2:5], axis=-1)
    sfeats = (
        jnp.stack(sorted_ops[5:], axis=-1)
        if features.shape[-1]
        else jnp.zeros((B, N, 0), xyz.dtype)
    )
    return SortedScene(skeys, sxyz, sfeats, sperm)


def center_ranks(
    point_keys: jnp.ndarray, center_keys: jnp.ndarray
) -> jnp.ndarray:
    """Rank of each center among the sorted points, again gather-free.

    Implemented as one joint sort of (key, is_center) pairs followed by a
    prefix count — equivalent to ``searchsorted(point_keys, center_keys)``
    but without per-query binary-search gathers.

    Args:
        point_keys: (B, N) ascending cell keys of sorted points.
        center_keys: (B, M) cell keys of the (sorted-by-key) centers.

    Returns:
        (B, M) int32: for each center (in its sorted order), the number of
        points with key strictly smaller — i.e. its insertion rank.
    """
    B, N = point_keys.shape
    M = center_keys.shape[1]
    # Joint sort: centers break ties BEFORE equal-keyed points (flag 0 < 1)
    # so the prefix point-count equals searchsorted-left.
    all_keys = jnp.concatenate([point_keys, center_keys], axis=1)
    flags = jnp.concatenate(
        [jnp.ones((B, N), jnp.int32), jnp.zeros((B, M), jnp.int32)], axis=1
    )
    skeys, sflags = jax.lax.sort([all_keys, flags], dimension=1, num_keys=2)
    prefix_points = jnp.cumsum(sflags, axis=1) - sflags  # points before slot
    # Compact the M center slots (flag==0) in order: sort by (flag, position).
    pos = jnp.broadcast_to(jnp.arange(N + M, dtype=jnp.int32), (B, N + M))
    _, _, ranks = jax.lax.sort([sflags, pos, prefix_points], dimension=1, num_keys=2)
    return ranks[:, :M]


def window_starts(
    ranks: jnp.ndarray, n_points: int, window: int
) -> jnp.ndarray:
    """Clamped start offset of a ``window``-length slice centered per rank."""
    return jnp.clip(ranks - window // 2, 0, max(n_points - window, 0)).astype(
        jnp.int32
    )
