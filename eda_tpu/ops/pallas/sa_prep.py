"""Fused SA layer-0 prep kernel: [xyz/r ; feats] @ W1 + b1 -> LN -> bf16.

The fused SA layer's per-point projection (``ops/fused_sa.py``: layer-0
matmul + point-grid LayerNorm + compute-dtype cast + the 128-lane zero-pad
of xyz for the pair kernel's manual DMAs) runs as ~8 separate XLA passes
over the (B, 50000, 128) point grid — ~15 ms/step at SA1 sizes measured on
v5e (reduce_sums, broadcast_multiply fusions, converts, and a 820 MB
standalone ``pad`` op). This kernel pair does the whole pipeline in ONE
pass each way:

* forward: read the raw sorted points (B, N, 3+C) f32 once, emit
  ``A = LN([xyz/r ; feats] @ W1_pad + b1_pad)`` in compute dtype at the
  kernel lane width AND the f32 xyz zero-padded to 128 lanes (both consumed
  by ``sa_pair_pool_pallas``). The xyz/radius division happens in-kernel at
  the same rounding point as the XLA formulation (divide f32, then round to
  compute dtype), keeping the two paths bit-comparable.
* backward: read dA once, recompute the LN stats from the points, and emit
  dW1 / db1 / dscale / dbias (resident accumulator outputs) plus dpts.

Padding invariants match ``sa_kernel``: W1's padding columns and the
bias/scale/bias vectors are zero-padded, so padding lanes stay exactly
zero through matmul+LN and the LN stats can use full-width sums divided by
the real width (``_ln_stats``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eda_tpu.ops.pallas.sa_kernel import _LANE, _ceil_lane, _ln_stats, _pad_lanes

_EPS = 1e-5


def _row_block(n: int, cap: int = 2048) -> int:
    """Largest divisor of ``n`` that is <= cap and a multiple of 16 (the
    bf16 sublane tile); falls back to n itself for small inputs."""
    if n <= cap:
        return n
    for nb in range(cap, 15, -16):
        if n % nb == 0:
            return nb
    return n


def _scaled(pts, radius, in_dim):
    """[xyz / r ; feats]: divide the first 3 lanes in f32, exactly like the
    XLA formulation's ``concatenate([sxyz / radius, sfeats])``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, pts.shape, 1)
    return jnp.where(lane < 3, pts / radius, pts)


def _fwd_kernel(c_real: int, in_dim: int, out_dtype, radius: float):
    def kernel(pts_ref, w_ref, b_ref, s_ref, lb_ref, a_ref, xyz_ref):
        pts = pts_ref[0]  # (nb, in_dim) f32
        # matmul + bias in compute dtype, matching the XLA formulation's
        # rounding points exactly (pts_in.astype(cd) @ w.astype(cd) +
        # b.astype(cd)) so the pallas and scan paths stay bit-comparable
        # Mosaic requires 32-bit matmul accumulators; rounding the f32
        # result to the compute dtype reproduces XLA's bf16 dot exactly
        # (f32 accumulate, round once)
        prod = jnp.dot(
            _scaled(pts, radius, in_dim).astype(out_dtype), w_ref[:, :],
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
        x = (prod + b_ref[:, :].astype(out_dtype)).astype(jnp.float32)
        mean, var = _ln_stats(x, c_real)
        a = (x - mean) * jax.lax.rsqrt(var + _EPS) * s_ref[:, :] + lb_ref[:, :]
        a_ref[0] = a.astype(out_dtype)
        # xyz -> lanes 0..2 of a 128-lane f32 block (pair-kernel DMA layout)
        xyz_ref[0] = jnp.pad(pts[:, :3], ((0, 0), (0, _LANE - 3)))

    return kernel


def _bwd_kernel(c_real: int, in_dim: int, compute_dtype, radius: float):
    def kernel(pts_ref, da_ref, w_ref, wt_ref, b_ref, s_ref,
               dpts_ref, dw_ref, db_ref, ds_ref, dlb_ref, *, nb):
        cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

        @pl.when(cell == 0)
        def _():
            dw_ref[:, :] = jnp.zeros_like(dw_ref)
            db_ref[:, :] = jnp.zeros_like(db_ref)
            ds_ref[:, :] = jnp.zeros_like(ds_ref)
            dlb_ref[:, :] = jnp.zeros_like(dlb_ref)

        pts_in = _scaled(pts_ref[0], radius, in_dim)  # (nb, in_dim) f32
        prod = jnp.dot(
            pts_in.astype(compute_dtype), w_ref[:, :],
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)
        x = (prod + b_ref[:, :].astype(compute_dtype)).astype(
            jnp.float32
        )  # same rounding points as the forward
        mean, var = _ln_stats(x, c_real)
        rstd = jax.lax.rsqrt(var + _EPS)
        xhat = (x - mean) * rstd

        g = da_ref[0].astype(jnp.float32)  # (nb, c1p); padding lanes zero
        ds_ref[:, :] += jnp.sum(g * xhat, axis=0, keepdims=True)
        dlb_ref[:, :] += jnp.sum(g, axis=0, keepdims=True)
        dxhat = g * s_ref[:, :]
        m1 = jnp.sum(dxhat, axis=1, keepdims=True) / c_real
        m2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True) / c_real
        dx = rstd * (dxhat - m1 - xhat * m2)
        if c_real != dx.shape[-1]:
            lane = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 1)
            dx = jnp.where(lane < c_real, dx, 0.0)
        dx_c = dx.astype(compute_dtype)
        dw_ref[:, :] += jax.lax.dot_general(
            pts_in.astype(compute_dtype), dx_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[:, :] += jnp.sum(dx, axis=0, keepdims=True)
        dpts = jnp.dot(
            dx_c, wt_ref[:, :], preferred_element_type=jnp.float32
        )[:, :in_dim]
        dpts_ref[0] = _scaled(dpts, radius, in_dim)  # d(x/r)/dx = 1/r

    return kernel


@functools.partial(
    jax.jit, static_argnames=("c_real", "dtype", "radius", "interpret")
)
def _prep_fwd(pts, w_pad, b_pad, s_pad, lb_pad, *, c_real, dtype, radius,
              interpret=False):
    B, N, in_dim = pts.shape
    c1p = w_pad.shape[1]
    nb = _row_block(N)
    grid = (B, N // nb)
    blk = lambda b, i: (b, i, 0)  # noqa: E731
    const = lambda b, i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        _fwd_kernel(c_real, in_dim, dtype, radius),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nb, in_dim), blk),
            pl.BlockSpec((w_pad.shape[0], c1p), const),
            pl.BlockSpec((1, c1p), const),
            pl.BlockSpec((1, c1p), const),
            pl.BlockSpec((1, c1p), const),
        ],
        out_specs=[
            pl.BlockSpec((1, nb, c1p), blk),
            pl.BlockSpec((1, nb, _LANE), blk),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, c1p), dtype),
            jax.ShapeDtypeStruct((B, N, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(pts, w_pad.astype(dtype), b_pad, s_pad, lb_pad)
    return out


@functools.partial(
    jax.jit, static_argnames=("c_real", "dtype", "radius", "interpret")
)
def _prep_bwd(pts, dA, w_pad, b_pad, s_pad, *, c_real, dtype, radius,
              interpret=False):
    B, N, in_dim = pts.shape
    c1p = w_pad.shape[1]
    in_pad = w_pad.shape[0]
    nb = _row_block(N)
    grid = (B, N // nb)
    blk = lambda b, i: (b, i, 0)  # noqa: E731
    const = lambda b, i: (0, 0)  # noqa: E731
    w_c = w_pad.astype(dtype)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel(c_real, in_dim, dtype, radius), nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nb, in_dim), blk),
            pl.BlockSpec((1, nb, c1p), blk),
            pl.BlockSpec((in_pad, c1p), const),
            pl.BlockSpec((c1p, in_pad), const),
            pl.BlockSpec((1, c1p), const),
            pl.BlockSpec((1, c1p), const),
        ],
        out_specs=[
            pl.BlockSpec((1, nb, in_dim), blk),
            pl.BlockSpec((in_pad, c1p), const),
            pl.BlockSpec((1, c1p), const),
            pl.BlockSpec((1, c1p), const),
            pl.BlockSpec((1, c1p), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, in_dim), jnp.float32),
            jax.ShapeDtypeStruct((in_pad, c1p), jnp.float32),
            jax.ShapeDtypeStruct((1, c1p), jnp.float32),
            jax.ShapeDtypeStruct((1, c1p), jnp.float32),
            jax.ShapeDtypeStruct((1, c1p), jnp.float32),
        ],
        interpret=interpret,
    )(pts, dA, w_c, w_c.T, b_pad, s_pad)
    return outs


_INTERPRET = None  # None = auto (interpret off-TPU); tests may force True


def _interpret() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _prep_pool(statics: Tuple):
    """custom_vjp wrapper; statics = (c_real, in_dim, dtype_name, radius)."""
    c_real, in_dim, dtype_name, radius = statics
    dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def prep(pts, w_pad, b_pad, s_pad, lb_pad):
        return _prep_fwd(
            pts, w_pad, b_pad, s_pad, lb_pad, c_real=c_real, dtype=dtype,
            radius=radius, interpret=_interpret(),
        )

    def fwd(pts, w_pad, b_pad, s_pad, lb_pad):
        out = prep(pts, w_pad, b_pad, s_pad, lb_pad)
        return out, (pts, w_pad, b_pad, s_pad)

    def bwd(res, gs):
        pts, w_pad, b_pad, s_pad = res
        dA, _ = gs  # xyz_pad feeds only the pair kernel: zero cotangent
        dpts, dw, db, dsc, dlb = _prep_bwd(
            pts, dA.astype(dtype), w_pad, b_pad, s_pad,
            c_real=c_real, dtype=dtype, radius=radius,
            interpret=_interpret(),
        )
        return (
            dpts,
            dw[: w_pad.shape[0]],
            db,
            dsc,
            dlb,
        )

    prep.defvjp(fwd, bwd)
    return prep


def sa_prep(pts, w1_pad, b1_pad, s1_pad, lb1_pad, *, c_real: int,
            radius: float, compute_dtype=jnp.bfloat16):
    """Fused layer-0 projection. See module docstring.

    Args:
        pts: (B, N, in_dim) f32 sorted points, xyz in the first 3 lanes,
            NOT yet divided by the radius (the kernel divides in f32 at the
            same rounding point as the XLA formulation).
        w1_pad: (in_dim, c1_pad) layer-0 kernel, columns zero-padded past
            ``c_real``.
        b1_pad / s1_pad / lb1_pad: (1, c1_pad) bias / LN scale / LN bias,
            zero-padded past ``c_real``.
        radius: SA ball radius (xyz scale).

    Returns:
        (A, xyz_pad): (B, N, c1_pad) compute-dtype pre-normalized projection
        and (B, N, 128) f32 xyz for the pair kernel's manual DMAs.
    """
    statics = (c_real, pts.shape[-1], jnp.dtype(compute_dtype).name, radius)
    return _prep_pool(statics)(pts, w1_pad, b1_pad, s1_pad, lb1_pad)
