"""Furthest point sampling as a Pallas TPU kernel.

The algorithm is serial over selections but fully vectorized over points: each
step folds the distance-to-last-selected into an N-length min-distance vector,
then takes a masked argmax. The CUDA reference
(``pointnet2/_ext_src/src/sampling_gpu.cu:75-134``) does this with one thread
block per batch row; the TPU twist here is that *batch rows ride the sublane
axis*: all rows in a block of 8 advance together, so every per-step VPU sweep
and reduction costs the same as a single row would. That amortization is worth
~16x over a row-at-a-time kernel (measured on v5e).

Design notes
------------
* Layout: coordinates arrive as ``(3, B, N)`` so x/y/z are ``(B, N)`` planes
  with N on lanes and B on sublanes — the native f32 (8, 128) tile.
* No dynamic indexing anywhere — Mosaic's dynamic lane-dim slicing is
  fragile. Argmax, per-row coordinate extraction of the selected points, and
  the output scatter all go through one-hot masked reductions over a
  broadcasted iota.
* All state (coords, min-distance, validity bias) lives in VMEM for the whole
  kernel: one HBM read of the point cloud in total.
* The padding-point guard (squared magnitude <= 1e-3 never selected,
  ``sampling_gpu.cu:105``) is an additive score bias, which also neutralizes
  lane/sublane padding rows.
* Grid is over blocks of 8 batch rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_GUARD = 1e-3
_BIG = 1e10
_ROW_BLOCK = 8


def _fps_kernel(xyz_ref, out_ref, mind_ref, acc_ref):
    """One block of 8 batch rows.

    xyz_ref: (3, Rb, N) f32 VMEM — x/y/z planes.
    out_ref: (Rb, M) int32 VMEM — selected indices.
    mind_ref: (Rb, N) f32 VMEM scratch — running min squared distance.
    acc_ref: (Rb, M) f32 VMEM scratch — one-hot accumulated output indices
        (exact: indices < 2^24 are representable in f32).
    """
    rb, n = mind_ref.shape
    m = out_ref.shape[1]

    x = xyz_ref[0, :, :]
    y = xyz_ref[1, :, :]
    z = xyz_ref[2, :, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (rb, m), 1)

    mag = x * x + y * y + z * z
    bias = jnp.where(mag > _PAD_GUARD, 0.0, -2.0 * _BIG)

    mind_ref[:, :] = jnp.full((rb, n), _BIG, jnp.float32)
    acc_ref[:, :] = jnp.zeros((rb, m), jnp.float32)

    def selected_coords(idx):
        """Coords of per-row index idx (rb, 1) via one-hot reduction."""
        hot = (lane == idx).astype(jnp.float32)
        x1 = jnp.sum(x * hot, axis=1, keepdims=True)
        y1 = jnp.sum(y * hot, axis=1, keepdims=True)
        z1 = jnp.sum(z * hot, axis=1, keepdims=True)
        return x1, y1, z1

    def step(j, carry):
        x1, y1, z1 = carry
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        mind = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = mind
        score = mind + bias
        best = jnp.max(score, axis=1, keepdims=True)  # (rb, 1)
        # First index achieving the max per row (ties -> lowest index).
        nxt = jnp.min(jnp.where(score >= best, lane, n), axis=1, keepdims=True)
        acc_ref[:, :] += jnp.where(out_lane == j, nxt, 0).astype(jnp.float32)
        return selected_coords(nxt)

    jax.lax.fori_loop(1, m, step, selected_coords(jnp.zeros((rb, 1), jnp.int32)))
    out_ref[:, :] = acc_ref[:, :].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(
    xyz: jnp.ndarray, npoint: int, *, interpret: bool = False
) -> jnp.ndarray:
    """Pallas FPS. Same contract as ``pointops.furthest_point_sample``.

    Args:
        xyz: (B, N, 3) float coordinates.
        npoint: number of samples (static).
        interpret: run in interpreter mode (CPU testing).

    Returns:
        (B, npoint) int32 indices.
    """
    B, N, _ = xyz.shape
    # Pad N to a lane multiple and B to the row block with origin points —
    # the padding guard makes them unselectable, so this is
    # semantics-preserving.
    n_pad = (-N) % 128
    b_pad = (-B) % _ROW_BLOCK
    m_pad = (-npoint) % 128
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # (3, B, N)
    if n_pad or b_pad:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, b_pad), (0, n_pad)))
    n_total, b_total, m_total = N + n_pad, B + b_pad, npoint + m_pad

    out = pl.pallas_call(
        _fps_kernel,
        grid=(b_total // _ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec(
                (3, _ROW_BLOCK, n_total), lambda r: (0, r, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_ROW_BLOCK, m_total), lambda r: (r, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_total, m_total), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_ROW_BLOCK, n_total), jnp.float32),
            pltpu.VMEM((_ROW_BLOCK, m_total), jnp.float32),
        ],
        interpret=interpret,
    )(xyz_t)
    return out[:B, :npoint]
