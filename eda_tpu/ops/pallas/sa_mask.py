"""Pallas TPU kernel: precomputed radius mask for the fused SA pair pool.

The pair kernel's ``d2_mode='pair'`` computes the radius test ON the pair
grid: replicate the (wc, 128)-padded window xyz to (P, 128), subtract the
replicated centers, square, lane-reduce — ~4 full VPU passes over the pair
grid per tile for a quantity with only 3 real lanes, plus a (W, 128) f32
window DMA per cell just to read 3 columns. This kernel computes the same
mask ONCE per (cell) from PLANAR xyz — (8, N) with rows x/y/z — so the d2
work runs at 3-real-rows cost instead of 3-real-lanes-in-128 cost, and the
pair kernel's ``d2_mode='pre'`` consumes the result with zero geometry work
(see ``sa_kernel._make_kernel``).

Orientation trick: the pair kernel wants per-center mask COLUMNS
(``pen[:, c]`` masks center ``c``'s wc contiguous pair rows), i.e. a
(window, block) layout, but planar d2 falls out as (block, window) rows. A
single homogeneous-coordinate MXU dot per cell produces the transposed
layout directly:

    d2[w, c] = |p_w - o|^2 - 2 (p_w - o) . (c - o) + |c - o|^2
             = sum_d  aug_p[d, w] * aug_c[d, c]

with aug_p rows [x, y, z, |p-o|^2, 1, 0...] and aug_c rows
[-2cx, -2cy, -2cz, 1, |c-o|^2, 0...]: ``dot_general`` contracting the
sublane dim of both operands yields (window, block) in one MXU op. The
cell-local origin ``o`` (the block's first center) keeps the expansion
numerically tight; like ``d2_mode='mxu'`` it is not bit-identical to the
direct |p-c|^2 <= r^2 test within ~1e-5 of the radius boundary (documented
in ``sa_kernel.py``).

Window alignment: Mosaic requires lane-dim dynamic slices at provably
128-aligned offsets, so the mask covers ``[start128, start128 + wp)`` where
``start128 = (start16 // 128) * 128`` and ``wp >= window + 112`` absorbs
the remainder; the pair kernel re-slices at the (sublane-dim, unrestricted)
offset ``start16 - start128``.

Replaces the in-pair-grid radius test of the CUDA ball query
(``/root/reference/pointnet2/_ext_src/src/ball_query_gpu.cu:14-49``)
semantics carried by the fused SA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# far-away fill for planar padding lanes: d2 ~ 1e12 >> any radius
_FAR = 1.0e6


def mask_window(window: int) -> int:
    """Mask window length: >= window + 112 (max 16-quantized remainder),
    rounded up to a 128 multiple for the aligned lane-dim DMA slice."""
    return ((window + 112 + _LANE - 1) // _LANE) * _LANE


def _make_mask_kernel(wp: int, block: int, r2: float, n_blocks: int):
    def kernel(starts_ref, xyz_ref, cen_ref, out_ref):
        b = pl.program_id(0)
        blk = pl.program_id(1)
        cell = b * n_blocks + blk
        s = pl.multiple_of(starts_ref[cell], _LANE)
        xw = xyz_ref[0, :, pl.ds(s, wp)]  # (8, wp); rows 3-7 zero / _FAR pad
        cen = cen_ref[0, 0]  # (8, block); rows 3-7 zero
        # cell-local origin: first center of the block (kills the
        # cancellation the raw |p|^2 - 2p.c + |c|^2 expansion suffers at
        # scene-scale coordinates)
        o = cen[:, 0:1]
        xw_sh = xw - o
        cen_sh = cen - o
        psq = (
            xw_sh[0:1] * xw_sh[0:1]
            + xw_sh[1:2] * xw_sh[1:2]
            + xw_sh[2:3] * xw_sh[2:3]
        )  # (1, wp)
        csq = (
            cen_sh[0:1] * cen_sh[0:1]
            + cen_sh[1:2] * cen_sh[1:2]
            + cen_sh[2:3] * cen_sh[2:3]
        )  # (1, block)
        xw_aug = jnp.concatenate(
            [xw_sh[0:3], psq, jnp.ones_like(psq), jnp.zeros((3, wp), jnp.float32)],
            axis=0,
        )  # (8, wp)
        cen_aug = jnp.concatenate(
            [
                -2.0 * cen_sh[0:3],
                jnp.ones_like(csq),
                csq,
                jnp.zeros((3, block), jnp.float32),
            ],
            axis=0,
        )  # (8, block)
        # one MXU dot, contracting the sublane dim of BOTH operands, lands
        # d2 directly in the (window, block) orientation the pair kernel
        # consumes — no transpose pass anywhere
        d2t = jax.lax.dot_general(
            xw_aug,
            cen_aug,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (wp, block)
        out_ref[0, 0] = jnp.where(d2t <= r2, 1.0, 0.0).astype(jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("radius", "window", "block", "interpret")
)
def sa_radius_mask(
    xyz_sorted: jnp.ndarray,
    cen_xyz: jnp.ndarray,
    starts16: jnp.ndarray,
    *,
    radius: float,
    window: int,
    block: int,
    interpret: bool = False,
):
    """In-radius mask per (window position, center) for every center block.

    Args:
        xyz_sorted: (B, N, >=3) f32 rank-ordered coordinates (extra lanes,
            e.g. the pair kernel's 128-lane padding, are ignored).
        cen_xyz: (B, M, 3) f32 center coordinates in rank order, where
            M = n_blocks * block.
        starts16: (B, n_blocks) int32 window starts, 16-quantized (exactly
            what the pair kernel derives from ``starts``).
        radius / window / block: as the pair kernel.

    Returns:
        (pen, offs): pen (B, n_blocks, wp, block) f32 in {0, 1}, covering
        window positions ``[start128, start128 + wp)`` of the sorted domain;
        offs (B, n_blocks) int32 = start16 - start128 in {0, 16, ..., 112},
        the sublane offset at which the pair kernel's W-long window begins
        inside each pen block.
    """
    B, N = xyz_sorted.shape[:2]
    n_blocks = starts16.shape[1]
    M = cen_xyz.shape[1]
    assert M == n_blocks * block, (M, n_blocks, block)
    wp = mask_window(window)
    npad = ((max(N, window) - window + wp + _LANE - 1) // _LANE) * _LANE

    starts128 = (starts16 // _LANE) * _LANE
    offs = (starts16 - starts128).astype(jnp.int32)

    # planar (B, 8, npad): rows 0-2 x/y/z; padding lanes (beyond N) sit at
    # _FAR so their d2 is astronomically out of radius. Rows 3-7 are never
    # read (psq and the aug rows rebuild them), so their fill is arbitrary.
    xyzT = jnp.transpose(xyz_sorted[..., :3], (0, 2, 1)).astype(jnp.float32)
    xyzT = jnp.pad(
        xyzT, ((0, 0), (0, 5), (0, npad - N)), constant_values=_FAR
    )

    cenT = jnp.transpose(
        cen_xyz.reshape(B, n_blocks, block, 3), (0, 1, 3, 2)
    ).astype(jnp.float32)  # (B, n_blocks, 3, block)
    cenT = jnp.pad(cenT, ((0, 0), (0, 0), (0, 5), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 8, npad), lambda b, blk, s: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8, block), lambda b, blk, s: (b, blk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, wp, block), lambda b, blk, s: (b, blk, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    pen = pl.pallas_call(
        _make_mask_kernel(wp, block, radius * radius, n_blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_blocks, wp, block), jnp.float32),
        interpret=interpret,
    )(starts128.reshape(-1).astype(jnp.int32), xyzT, cenT)
    return pen, offs
