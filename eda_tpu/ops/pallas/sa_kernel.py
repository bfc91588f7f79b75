"""Pallas TPU kernel for the fused set-abstraction pair MLP.

The XLA formulation of the fused SA layer (``ops/fused_sa.py``) materializes
every (centers x window x channels) pair tensor in HBM — ~25 GB of traffic
per training batch at SA1 sizes, making the backbone ~98% of the forward.
This kernel keeps pair tiles in VMEM: per grid cell it DMAs one small center
block's point window from HBM, streams pair tiles through LayerNorm + ReLU +
the pair matmuls on the MXU, masks by radius, and folds a per-center running
max. Only the per-point projection ``A`` and the (M, c_out) output touch HBM.

Layout (every op Mosaic-friendly):
* pair tensors are (P, C): the CENTER-major pair axis ``c * wc + p`` on
  sublanes, channels on lanes — natural matmul orientation, LayerNorm is a
  lane reduction, and the per-center max reduces each center's contiguous
  ``wc`` rows (see ``_make_kernel`` for why the point-major/tree-fold
  variant lost the A/B);
* center-side rows expand through a constant 0/1 kron matmul on the MXU
  (``R2 = kron(I_cm, 1_wc)``), point-side rows tile by concatenation
  (``pltpu.repeat``);
* blocks are SMALL (cm ~ 8-16 centers): rank-sorted centers are spatially
  local, so a small block needs only a short window (W ~ 512), cutting total
  pair work ~4x vs wide blocks (out-of-radius tiles run anyway: a
  ``pl.when`` radius precheck measured 15-26% slower end to end — per-tile
  control flow defeats Mosaic's pipelining);
* manually-DMA'd arrays must have 128-aligned lane dims, so A and xyz are
  zero-padded to 128 lanes; padding lanes carry zero weights/scale/bias so
  they stay EXACTLY zero through the MLP, which lets LayerNorm use
  full-width sums (``_ln_stats``) instead of masked reductions.

Layer-1 separability (see ``ops/fused_sa.py``) happens outside: the kernel
receives ``A = [xyz/r; f] @ W1 + b1`` per point and the per-center offsets
``b_c``; the caller maxes in the self term and restores rank order exactly
like the XLA path.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9
_LANE = 128

# Radius-test strategy (see _make_kernel): "mxu" computes the per-pair d2 as
# a tiny (wc, cm) expansion-formula dot on the MXU; "pair" replicates xyz to
# the (P, 128) pair grid and lane-reduces on the VPU; "pre" consumes a mask
# PRECOMPUTED by ``sa_mask.sa_radius_mask`` (planar-xyz d2 at 3-real-rows
# cost, one homogeneous MXU dot per cell) so the pair kernel runs zero
# geometry work and skips the (W, 128) f32 xyz window DMA entirely.
# Default "pair" — the round-4 on-device A/B (v5e, batch 32, bench.py,
# median of >=4 reps) was decisive against 'mxu': pair fwd 282.9 / train
# 100.6 scenes/sec vs mxu 246.2 / 95.8 (-13%/-5%) — tiny per-tile MXU
# launches lose to streaming VPU work (same lesson as the round-2
# point-major A/B). That A/B also fully explains the round-3
# BENCH(247.4)-vs-README(283) gap: the 'mxu' flip shipped unmeasured.
# 'pre' removes the per-tile d2 ALTOGETHER rather than re-placing it, but
# the round-4 on-device A/B was ALSO negative: per-segment column-slice
# wheres measured fwd 249.2, and the restructured pair-layout expansion
# (repeat + rowwise dot with the resident R2 matrix, one broadcast-where —
# the shape kept below) fwd 264.3 / train 97.3 vs pair's same-session
# 282.9 / 100.6. Lesson: the pair grid's d2 math is ~free because it fuses
# into passes that stream anyway; ANY mask expansion to pair layout adds
# whole passes plus the pen DMA. Kept as a documented mode. Resolved at
# CALL time (not import) so tests can parametrize modes without
# importlib.reload; override per call via ``d2_mode=`` or ambient default
# via ``EDA_SA_D2``.
#
# Numerics note: the "mxu"/"pre" expansion formulas (around a cell-local
# origin) are not bit-identical to the direct |p-c|^2 <= r2 test — points
# within ~1e-5 m of the radius boundary can flip in/out vs "pair"/the XLA
# path, so winner selection differs across modes at exact boundary ties.
# Parity tests that rely on deterministic index selection pin "pair" or use
# grid-quantized inputs away from the boundary.
_D2_DEFAULT = "pair"


def _resolve_d2_mode(d2_mode: str | None) -> str:
    mode = d2_mode or os.environ.get("EDA_SA_D2", _D2_DEFAULT)
    if mode not in ("pair", "mxu", "pre"):
        raise ValueError(
            f"EDA_SA_D2/d2_mode must be 'pair', 'mxu' or 'pre', got {mode!r}"
        )
    return mode


def _pad_lanes(x: jnp.ndarray, width: int) -> jnp.ndarray:
    pad = width - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def _ln_stats(x, c_real: int):
    """(mean, var) over the first ``c_real`` lanes of (P, C_pad) f32 ``x``.

    Relies on the kernel invariant that PADDING LANES ARE EXACTLY ZERO
    (weight columns and biases are zero-padded), so full-width sums equal
    real-lane sums: mean = S1/c, var = S2/c - mean**2 — no iota/where masks,
    which cost 3 extra pair-grid passes per LayerNorm.
    """
    s1 = jnp.sum(x, axis=1, keepdims=True)
    s2 = jnp.sum(x * x, axis=1, keepdims=True)
    mean = s1 / c_real
    var = jnp.maximum(s2 / c_real - mean * mean, 0.0)
    return mean, var


def _ln_relu_masked(x, scale, bias, c_real: int, eps=1e-5):
    """f32 LayerNorm over the first ``c_real`` lanes + ReLU.

    x: (P, C_pad); scale/bias: (1, C_pad) zero-padded past c_real, which
    forces padding lanes to zero after normalization.
    """
    x = x.astype(jnp.float32)
    mean, var = _ln_stats(x, c_real)
    out = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return jnp.maximum(out, 0.0)


def _make_kernel(
    widths: Tuple[int, ...], W: int, wc: int, cm: int, r2: float,
    with_winners: bool = False, d2_mode: str = _D2_DEFAULT,
):
    """CENTER-major pair kernel: pair row ``c * wc + p`` pairs block center
    ``c`` with window point ``p``.

    Center-major keeps every per-tile stage on contiguous slices: the point
    side replicates with a cheap tile (``pltpu.repeat`` has concat
    semantics), the center side expands through a small (P, cm) kron matmul,
    and the per-center segmented max reduces each center's contiguous wc
    rows. A point-major variant with tree-fold reductions and MXU-based
    replication measured ~30% SLOWER end to end on v5e (27.7 vs 20.9 ms at
    SA1 scale, B=8) — the extra per-tile matmul launches cost more than the
    fold savings — so this layout is the keeper. Winner export adds only
    ~5%: the in-tile argmax runs per center (Mosaic has no sublane argmax
    primitive), and the running accumulators update once per tile on the
    batched (cm, C) results rather than per center on (1, C) slices.

    ``d2_mode='pre'`` swaps the signature: instead of xyz/cen inputs and an
    in-tile radius test, the kernel receives the precomputed (wp, cm) mask
    from ``sa_mask.sa_radius_mask`` plus per-cell sublane offsets — no xyz
    window DMA (a (W, 128) f32 stream per cell whose real content is 3
    lanes) and no pair-grid d2 passes at all.
    """
    n_layers = len(widths)
    d2_mxu = d2_mode == "mxu"
    d2_pre = d2_mode == "pre"

    def kernel(*args):
        if d2_pre:
            starts_ref, offs_ref, a_hbm, bc_ref, pen_ref, r1_ref = args[:6]
            rest = args[6:]
        else:
            starts_ref, a_hbm, xyz_hbm, bc_ref, cen_ref, r1_ref = args[:6]
            rest = args[6:]
        n_p = 4 * n_layers  # per layer: kernel, bias, ln_scale, ln_bias
        param_refs = rest[:n_p]
        out_ref = rest[n_p]
        if with_winners:
            idx_ref = rest[n_p + 1]
            scratch = rest[n_p + 2:]
        else:
            scratch = rest[n_p + 1:]
        if d2_pre:
            if with_winners:
                a_buf, acc, acc_idx, sem_a = scratch
            else:
                a_buf, acc, sem_a = scratch
        else:
            if with_winners:
                a_buf, xyz_buf, acc, acc_idx, sem_a, sem_x = scratch
            else:
                a_buf, xyz_buf, acc, sem_a, sem_x = scratch

        b = pl.program_id(0)
        blk = pl.program_id(1)
        n_blocks = pl.num_programs(1)
        n_cells = pl.num_programs(0) * n_blocks
        cell = b * n_blocks + blk
        slot = jax.lax.rem(cell, 2)
        next_slot = jax.lax.rem(cell + 1, 2)

        def issue(cell_idx, dst_slot):
            """Start the window DMAs for linear grid cell ``cell_idx``."""
            src_b = cell_idx // n_blocks
            start = pl.multiple_of(starts_ref[cell_idx], 16)
            pltpu.make_async_copy(
                a_hbm.at[src_b, pl.ds(start, W), :],
                a_buf.at[dst_slot],
                sem_a.at[dst_slot],
            ).start()
            if not d2_pre:
                pltpu.make_async_copy(
                    xyz_hbm.at[src_b, pl.ds(start, W), :],
                    xyz_buf.at[dst_slot],
                    sem_x.at[dst_slot],
                ).start()

        # Double buffering: cell i waits for the window issued at cell i-1
        # (or self-issued when first) while prefetching cell i+1's window —
        # without the overlap, DMA latency alone costs more than the math.
        @pl.when(cell == 0)
        def _():
            issue(0, 0)

        @pl.when(cell + 1 < n_cells)
        def _():
            issue(cell + 1, next_slot)

        acc[:, :] = jnp.full_like(acc[:, :], _NEG)
        if with_winners:
            acc_idx[:, :] = jnp.zeros_like(acc_idx[:, :])
        win_start = pl.multiple_of(starts_ref[cell], 16)
        pltpu.make_async_copy(
            a_hbm.at[0, pl.ds(0, W), :], a_buf.at[slot], sem_a.at[slot]
        ).wait()
        if not d2_pre:
            pltpu.make_async_copy(
                xyz_hbm.at[0, pl.ds(0, W), :], xyz_buf.at[slot], sem_x.at[slot]
            ).wait()
            xyz_win = xyz_buf.at[slot]
        a_win = a_buf.at[slot]

        bc = bc_ref[0]  # (cm, C_pad)
        R2 = r1_ref[:, :]  # (P, cm) f32: R2[c*wc + p, c] = 1
        bc_rep = jnp.dot(
            R2, bc.astype(jnp.float32), preferred_element_type=jnp.float32
        )  # (P, C_pad)
        if d2_pre:
            # mask rows for this cell's W-long window start at the sublane
            # offset start16 - start128 inside the (wp, cm) pen block
            pen_off = pl.multiple_of(offs_ref[cell], 16)
        elif d2_mxu:
            cen = cen_ref[0]  # (cm, 128): lanes 0..2 are x,y,z, rest zero
            # d2 via the expansion |p-o|^2 - 2(p-o)@(c-o) + |c-o|^2 around a
            # CELL-LOCAL origin o = first center (kills the cancellation the
            # raw expansion suffers): the pair term is a tiny (wc, cm) MXU
            # dot instead of a (P, 128) xyz replication + full-width VPU
            # lane reduction — the single largest VPU item in the tile.
            # Lanes >= 3 of xw/cen are zero-padded, so full-width sums are
            # exact; lane 3 carries the homogeneous-coordinate trick: the
            # augmented point row has 1 there and the augmented center row
            # |c-o|^2, folding the center norm into the same dot.
            origin = cen[0:1, :]  # (1, 128) f32
            cen_sh = cen - origin  # (cm, 128); padding lanes stay zero
            csq = jnp.sum(cen_sh * cen_sh, axis=1, keepdims=True)  # (cm, 1)
            lane_c = jax.lax.broadcasted_iota(jnp.int32, cen.shape, 1)
            cen_aug = jnp.where(lane_c == 3, csq, cen_sh)
        else:
            cen = cen_ref[0]  # (cm, 128): lanes 0..2 are x,y,z, rest zero
            cen_rep = jnp.dot(
                R2, cen, preferred_element_type=jnp.float32
            )  # (P, 128)

        def tile_body(t):
            if d2_pre:
                # (wc, cm) mask slice for this tile, expanded to the pair
                # layout as ONE (P, 1) column: repeat tiles pen_t so row
                # c*wc+p holds pen_t[p, :], and the rowwise dot with the
                # 0/1 R2 matrix (already resident for bc expansion) picks
                # lane c — 3 cheap passes over (P, cm=16) lanes, then the
                # same single broadcast-where as 'pair' mode. Per-segment
                # column-slice wheres (the 'mxu'-mode structure) measured
                # ~13% slower end to end than this shape.
                pen_t = pen_ref[0, 0, pl.ds(pen_off + t * wc, wc), :]
                pen_pair = jnp.sum(
                    pltpu.repeat(pen_t, cm, axis=0) * R2,
                    axis=1, keepdims=True,
                )  # (P, 1)
                in_radius = pen_pair > 0.5
            elif d2_mxu:
                xw = xyz_win[pl.ds(t * wc, wc), :]  # (wc, 128) f32
                xw_sh = xw - origin  # (wc, 128)
                psq = jnp.sum(xw_sh * xw_sh, axis=1, keepdims=True)  # (wc, 1)
                lane_w = jax.lax.broadcasted_iota(jnp.int32, xw.shape, 1)
                xw_aug = jnp.where(lane_w == 3, 1.0, -2.0 * xw_sh)
                pc = jax.lax.dot_general(
                    xw_aug, cen_aug,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (wc, cm): pc[p, c] + psq[p] = d2(p, c)
                thr = r2 - psq  # (wc, 1); in-radius iff pc[:, c] <= thr
            else:
                xw = xyz_win[pl.ds(t * wc, wc), :]  # (wc, 128) f32
                p_xyz = pltpu.repeat(xw, cm, axis=0)  # (P, 128), tile
                delta = p_xyz - cen_rep  # padding lanes zero on both sides
                d2 = jnp.sum(delta * delta, axis=1, keepdims=True)  # (P, 1)
                in_radius = d2 <= r2

            # NO per-tile skip branch: a pl.when(any(in_radius)) precheck
            # measured 15-26% SLOWER end to end (round 3, B=32 SA1 on both
            # uniform and synthetic-scene geometry) — the any() reduction
            # plus per-tile control flow defeats Mosaic's pipelining, and
            # an all-out-of-radius tile is already a no-op (all rows -NEG,
            # accumulator max unchanged). This reverses the round-2 lore
            # that tile skipping was worth ~30%.
            # A arrives PRE-NORMALIZED (layer 0's LN runs on the point
            # grid outside); the last layer's LN+ReLU runs on the pooled
            # centers outside. Only interior layers pay pair-grid LN —
            # measured on v5e, each pair-grid LN costs as much as the
            # whole tile's MXU matmuls.
            awt = a_win[pl.ds(t * wc, wc), :].astype(jnp.float32)
            aw_rep = pltpu.repeat(awt, cm, axis=0)  # (P, C_pad)
            h = jnp.maximum(aw_rep + bc_rep, 0.0).astype(jnp.bfloat16)
            for li in range(1, n_layers):
                w = param_refs[4 * li][:, :]  # (C_pad_in, C_pad_out)
                h_pre = (
                    jnp.dot(h, w, preferred_element_type=jnp.float32)
                    + param_refs[4 * li + 1][:, :]  # (1, C_pad_out)
                )
                if li < n_layers - 1:
                    h = _ln_relu_masked(
                        h_pre,
                        param_refs[4 * li + 2][:, :],
                        param_refs[4 * li + 3][:, :],
                        widths[li],
                    ).astype(jnp.bfloat16)
                else:
                    h = h_pre  # last layer: pool the f32 pre-activation

            hf = h.astype(jnp.float32)
            # center-major segmented max: each center's wc contiguous
            # rows reduce across sublanes; the running accumulators then
            # update ONCE per tile on the stacked (cm, C) results
            # (single-sublane (1, C) read-modify-writes were ~2x the
            # cost of the segment reductions themselves). In mxu d2 mode
            # the radius mask applies per segment from the (wc, cm) d2
            # columns, fused into the same per-center slices.
            if d2_mxu:
                masked_segs = [
                    jnp.where(
                        pc[:, c:c + 1] <= thr,
                        hf[c * wc:(c + 1) * wc, :],
                        _NEG,
                    )
                    for c in range(cm)
                ]
            else:
                masked = jnp.where(in_radius, hf, _NEG)
                masked_segs = [
                    masked[c * wc:(c + 1) * wc, :] for c in range(cm)
                ]
            seg_maxes = [
                jnp.max(ms, axis=0, keepdims=True) for ms in masked_segs
            ]
            seg_max = jnp.concatenate(seg_maxes, axis=0)  # (cm, C)
            if not with_winners:
                acc[:, :] = jnp.maximum(acc[:, :], seg_max)
            else:
                # winner export: per (center, channel) the GLOBAL rank
                # of the argmax point. In-tile argmax via masked
                # row-iota (no sublane argmax primitive); across tiles
                # strict > keeps the first-seen max like the running
                # fold.
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (wc, hf.shape[1]), 0
                )
                in_segs = [
                    jnp.max(
                        jnp.where(
                            masked_segs[c] >= seg_maxes[c],
                            rows,
                            -1,
                        ),
                        axis=0,
                        keepdims=True,
                    )
                    for c in range(cm)
                ]
                in_seg = jnp.concatenate(in_segs, axis=0)  # (cm, C)
                better = seg_max > acc[:, :]
                acc_idx[:, :] = jnp.where(
                    better, win_start + t * wc + in_seg, acc_idx[:, :]
                )
                acc[:, :] = jnp.where(better, seg_max, acc[:, :])

        # static (unrolled) loop: slice offsets must be compile-time aligned
        for t in range(W // wc):
            tile_body(t)

        out_ref[0] = acc[:, :]
        if with_winners:
            idx_ref[0] = acc_idx[:, :]

    return kernel


def _ceil_lane(c: int) -> int:
    return ((c + _LANE - 1) // _LANE) * _LANE


def _make_bwd_kernel(widths: Tuple[int, ...], W: int, wc: int, cm: int):
    """Backward of the fused pair pool: same windows, winner-routed grads.

    Per grid cell (one center block) the kernel re-streams the block's point
    window, recomputes the pair MLP tile by tile (residual-free — VMEM holds
    a tile's activations only), routes the output cotangent to the winning
    pair of each (center, out_channel) via the winner ranks exported by the
    forward, and backpropagates through the tile entirely on-chip. No
    geometry is needed: a winner is in-radius by construction and centers
    whose pooled output lost to the self term arrive with zero cotangent.

    Accumulators:
    * ``dA`` (per-point grads): per-cell VMEM window accumulator, folded into
      HBM by a read-modify-write DMA at cell end — safe because the TPU grid
      runs sequentially, and synchronous so the next (overlapping) window
      never races the write.
    * ``db_c``: per-cell output block (cells own disjoint center blocks).
    * weight / bias / LN grads: outputs with a constant index map — the block
      stays resident in VMEM across the whole grid and is written back once.

    Tiles run branch-free, winners or not (a dead tile only adds zeros):
    a per-tile winner-liveness ``pl.when`` measured 4-7% slower, same
    pipelining story as the forward's removed radius precheck.
    """
    n_layers = len(widths)

    def kernel(starts_ref, a_hbm, da_in, bc_ref, g_ref, win_ref, r2_ref,
               *rest):
        # params: per layer li in 1..n_layers-1 -> [w, wt, b] (+[scale, lnb]
        # when interior); outputs: da_out, dbc, then per layer [dw, db]
        # (+[ds, dlb] when interior); scratch: a_buf, da_acc, rmw, sems.
        p_refs = {}
        k = 0
        for li in range(1, n_layers):
            p_refs[("w", li)] = rest[k]
            p_refs[("wt", li)] = rest[k + 1]
            p_refs[("b", li)] = rest[k + 2]
            k += 3
            if li < n_layers - 1:
                p_refs[("scale", li)] = rest[k]
                p_refs[("lnb", li)] = rest[k + 1]
                k += 2
        da_out = rest[k]
        dbc_ref = rest[k + 1]
        k += 2
        o_refs = {}
        for li in range(1, n_layers):
            o_refs[("dw", li)] = rest[k]
            o_refs[("db", li)] = rest[k + 1]
            k += 2
            if li < n_layers - 1:
                o_refs[("ds", li)] = rest[k]
                o_refs[("dlb", li)] = rest[k + 1]
                k += 2
        a_buf, da_acc, rmw_buf, sem_a, sem_rmw = rest[k:]

        b = pl.program_id(0)
        blk = pl.program_id(1)
        n_blocks = pl.num_programs(1)
        n_cells = pl.num_programs(0) * n_blocks
        cell = b * n_blocks + blk
        slot = jax.lax.rem(cell, 2)
        next_slot = jax.lax.rem(cell + 1, 2)

        def issue(cell_idx, dst_slot):
            src_b = cell_idx // n_blocks
            start = pl.multiple_of(starts_ref[cell_idx], 16)
            pltpu.make_async_copy(
                a_hbm.at[src_b, pl.ds(start, W), :],
                a_buf.at[dst_slot],
                sem_a.at[dst_slot],
            ).start()

        @pl.when(cell == 0)
        def _():
            issue(0, 0)
            for li in range(1, n_layers):
                o_refs[("dw", li)][:, :] = jnp.zeros_like(o_refs[("dw", li)])
                o_refs[("db", li)][:, :] = jnp.zeros_like(o_refs[("db", li)])
                if li < n_layers - 1:
                    o_refs[("ds", li)][:, :] = jnp.zeros_like(o_refs[("ds", li)])
                    o_refs[("dlb", li)][:, :] = jnp.zeros_like(o_refs[("dlb", li)])

        @pl.when(cell + 1 < n_cells)
        def _():
            issue(cell + 1, next_slot)

        da_acc[:, :] = jnp.zeros_like(da_acc[:, :])
        dbc_ref[0] = jnp.zeros_like(dbc_ref[0])
        win_start = pl.multiple_of(starts_ref[cell], 16)
        pltpu.make_async_copy(
            a_hbm.at[0, pl.ds(0, W), :], a_buf.at[slot], sem_a.at[slot]
        ).wait()
        a_win = a_buf.at[slot]

        R2 = r2_ref[:, :]  # (P, cm) f32
        bc = bc_ref[0]  # (cm, c1_pad) bf16 — cast f32 exactly like forward
        bc_rep = jnp.dot(
            R2, bc.astype(jnp.float32), preferred_element_type=jnp.float32
        )
        g_rep = jnp.dot(
            R2, g_ref[0], preferred_element_type=jnp.float32
        )  # (P, c_out_pad)
        # winner ranks replicate through the same 0/1 matmul; exact in f32
        # for ranks < 2^24 (N is ~50k)
        win_rep = jnp.dot(
            R2, win_ref[0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (wc, win_rep.shape[1]), 0
        )
        rows_rep = pltpu.repeat(rows, cm, axis=0)  # (P, c_out_pad) tile

        def tile_body(t):
            # NO per-tile winner-liveness branch: like the forward's radius
            # precheck, a pl.when(any(live)) skip measured SLOWER (SA2
            # 34.9 -> 32.4 ms, SA3 20.0 -> 18.9, SA4 13.2 -> 12.7 without
            # it, B=32) — the reduction + control flow defeat Mosaic's
            # pipelining. A dead tile's body is exact anyway: eq rows either
            # miss (winner outside the tile) or carry g = 0 (center lost to
            # the self term / padding, winner default rank 0), so every
            # accumulator update adds zeros.
            lo = win_start + t * wc

            def _tile():
                grow = rows_rep + lo
                eq = grow == win_rep  # (P, c_out_pad)
                d_out = jnp.where(eq, g_rep, 0.0)  # (P, c_out_pad) f32
                # ---- recompute forward (skip the last matmul: its output
                # only fed the max, whose cotangent comes from g & winners)
                awt = a_win[pl.ds(t * wc, wc), :].astype(jnp.float32)
                h0_pre = pltpu.repeat(awt, cm, axis=0) + bc_rep  # (P, c1_pad)
                hs = [jnp.maximum(h0_pre, 0.0).astype(jnp.bfloat16)]
                stats = {}
                for li in range(1, n_layers - 1):
                    h_pre = (
                        jnp.dot(
                            hs[-1], p_refs[("w", li)][:, :],
                            preferred_element_type=jnp.float32,
                        )
                        + p_refs[("b", li)][:, :]
                    )
                    c_real = widths[li]
                    x = h_pre
                    # same sum-based stats as the forward (_ln_stats):
                    # padding lanes are exactly zero, so full-width sums
                    # equal real-lane sums — and the recompute matches the
                    # forward's values bit for bit.
                    mean, var = _ln_stats(x, c_real)
                    rstd = jax.lax.rsqrt(var + 1e-5)
                    xhat = (x - mean) * rstd
                    out = xhat * p_refs[("scale", li)][:, :] + p_refs[("lnb", li)][:, :]
                    stats[li] = (xhat, rstd)
                    hs.append(jnp.maximum(out, 0.0).astype(jnp.bfloat16))

                # ---- backward
                last = n_layers - 1
                d_bf = d_out.astype(jnp.bfloat16)
                o_refs[("dw", last)][:, :] += jax.lax.dot_general(
                    hs[last - 1], d_bf,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_refs[("db", last)][:, :] += jnp.sum(
                    d_out, axis=0, keepdims=True
                )
                dh = jnp.dot(
                    d_bf, p_refs[("wt", last)][:, :],
                    preferred_element_type=jnp.float32,
                )
                for li in range(n_layers - 2, 0, -1):
                    xhat, rstd = stats[li]
                    c_real = widths[li]
                    # relu mask in f32 (bf16 comparisons unsupported on TPU)
                    dln = jnp.where(
                        hs[li].astype(jnp.float32) > 0.0, dh, 0.0
                    )
                    o_refs[("ds", li)][:, :] += jnp.sum(
                        dln * xhat, axis=0, keepdims=True
                    )
                    o_refs[("dlb", li)][:, :] += jnp.sum(
                        dln, axis=0, keepdims=True
                    )
                    dxhat = dln * p_refs[("scale", li)][:, :]
                    m1 = jnp.sum(dxhat, axis=1, keepdims=True) / c_real
                    m2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True) / c_real
                    dx = rstd * (dxhat - m1 - xhat * m2)
                    if c_real != dx.shape[-1]:
                        lane = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 1)
                        dx = jnp.where(lane < c_real, dx, 0.0)
                    dx_bf = dx.astype(jnp.bfloat16)
                    o_refs[("dw", li)][:, :] += jax.lax.dot_general(
                        hs[li - 1], dx_bf,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    o_refs[("db", li)][:, :] += jnp.sum(
                        dx, axis=0, keepdims=True
                    )
                    dh = jnp.dot(
                        dx_bf, p_refs[("wt", li)][:, :],
                        preferred_element_type=jnp.float32,
                    )
                dh0 = jnp.where(h0_pre > 0, dh, 0.0)  # (P, c1_pad) f32
                # fold pairs back: dA_p += sum_c dh0[c*wc + p];
                # db_c += sum_p dh0[c*wc + p] — small exact f32 VPU
                # reductions. The dA fold tree-halves the sublane axis
                # (rows j and j + P/2 share a point whenever the offset is
                # a multiple of wc); dbc stacks the per-center sums and
                # updates the ref ONCE per tile instead of cm times on
                # single-sublane slices.
                da_tile = dh0
                while da_tile.shape[0] > wc:
                    half = da_tile.shape[0] // 2
                    da_tile = da_tile[:half] + da_tile[half:]
                da_acc[pl.ds(t * wc, wc), :] += da_tile
                dbc_ref[0] += jnp.concatenate(
                    [
                        jnp.sum(
                            dh0[c * wc:(c + 1) * wc, :], axis=0, keepdims=True
                        )
                        for c in range(cm)
                    ],
                    axis=0,
                )

            _tile()

        for t in range(W // wc):
            tile_body(t)

        # read-modify-write the window's dA back to HBM. Synchronous: the
        # next cell's window overlaps this one, so its read must observe our
        # write — the wait enforces that under sequential grid execution.
        read = pltpu.make_async_copy(
            da_out.at[b, pl.ds(win_start, W), :], rmw_buf, sem_rmw
        )
        read.start()
        read.wait()
        rmw_buf[:, :] += da_acc[:, :]
        write = pltpu.make_async_copy(
            rmw_buf, da_out.at[b, pl.ds(win_start, W), :], sem_rmw
        )
        write.start()
        write.wait()

    return kernel


def _make_bwd_compact_kernel(widths: Tuple[int, ...], W: int, cm: int):
    """Winner-compact backward: pair rows are (center, out_channel) slots.

    The windowed backward (``_make_bwd_kernel``) re-streams and recomputes
    the full W-row window per center block even though only the c_out winner
    pairs per center carry gradient. This kernel's pair grid is
    (cm x c_out_pad) rows — row ``c * c_out_pad + o`` is center ``c``'s
    winning pair for out-channel ``o`` — i.e. W / c_out_pad x less pair work
    (8x at SA1's W=1024, c_out=128). Winner rows are *gathered from the
    VMEM-resident window by chunked 0/1 selection matmuls on the MXU*, and
    dA scatters back through the same chunks' transpose contraction; the
    XLA-level ``impl="winner"`` variant proved device gathers/scatter-adds
    are row-rate-bound on TPU (fused_sa.py:644-651) — a matmul is not, and
    S-chunk construction is two iota compares on the VPU.

    Cotangent routing: row (c, o) carries ``g[c, o]`` at lane ``o`` only
    (one-hot), so each channel backpropagates on its own row; the windowed
    kernel instead backpropagates each pair row once with its multi-channel
    cotangent. Both are exact in f32; they differ only in where the bf16
    rounding of the cotangent happens (per-channel here), within ~2^-8
    relative. Rows whose channel has zero cotangent (self-term winners,
    padding channels, out-of-window default ranks) select nothing and
    contribute exactly zero everywhere.
    """
    n_layers = len(widths)
    c_out_pad = _ceil_lane(widths[-1])
    P = cm * c_out_pad
    n_chunks = W // _LANE

    def kernel(starts_ref, a_hbm, da_in, bc_ref, g_ref, win_ref, r2_ref,
               *rest):
        p_refs = {}
        k = 0
        for li in range(1, n_layers):
            p_refs[("w", li)] = rest[k]
            p_refs[("wt", li)] = rest[k + 1]
            p_refs[("b", li)] = rest[k + 2]
            k += 3
            if li < n_layers - 1:
                p_refs[("scale", li)] = rest[k]
                p_refs[("lnb", li)] = rest[k + 1]
                k += 2
        da_out = rest[k]
        dbc_ref = rest[k + 1]
        k += 2
        o_refs = {}
        for li in range(1, n_layers):
            o_refs[("dw", li)] = rest[k]
            o_refs[("db", li)] = rest[k + 1]
            k += 2
            if li < n_layers - 1:
                o_refs[("ds", li)] = rest[k]
                o_refs[("dlb", li)] = rest[k + 1]
                k += 2
        a_buf, da_acc, rmw_buf, sem_a, sem_rmw = rest[k:]

        b = pl.program_id(0)
        blk = pl.program_id(1)
        n_blocks = pl.num_programs(1)
        n_cells = pl.num_programs(0) * n_blocks
        cell = b * n_blocks + blk
        slot = jax.lax.rem(cell, 2)
        next_slot = jax.lax.rem(cell + 1, 2)

        def issue(cell_idx, dst_slot):
            src_b = cell_idx // n_blocks
            start = pl.multiple_of(starts_ref[cell_idx], 16)
            pltpu.make_async_copy(
                a_hbm.at[src_b, pl.ds(start, W), :],
                a_buf.at[dst_slot],
                sem_a.at[dst_slot],
            ).start()

        @pl.when(cell == 0)
        def _():
            issue(0, 0)
            for li in range(1, n_layers):
                o_refs[("dw", li)][:, :] = jnp.zeros_like(o_refs[("dw", li)])
                o_refs[("db", li)][:, :] = jnp.zeros_like(o_refs[("db", li)])
                if li < n_layers - 1:
                    o_refs[("ds", li)][:, :] = jnp.zeros_like(o_refs[("ds", li)])
                    o_refs[("dlb", li)][:, :] = jnp.zeros_like(o_refs[("dlb", li)])

        @pl.when(cell + 1 < n_cells)
        def _():
            issue(cell + 1, next_slot)

        da_acc[:, :] = jnp.zeros_like(da_acc[:, :])
        win_start = pl.multiple_of(starts_ref[cell], 16)
        pltpu.make_async_copy(
            a_hbm.at[0, pl.ds(0, W), :], a_buf.at[slot], sem_a.at[slot]
        ).wait()
        a_win = a_buf.at[slot]

        R2 = r2_ref[:, :]  # (P, cm) f32: R2[c * c_out_pad + o, c] = 1
        bc_rep = jnp.dot(
            R2, bc_ref[0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # (P, c1_pad)
        g_rep = jnp.dot(
            R2, g_ref[0], preferred_element_type=jnp.float32
        )  # (P, c_out_pad)
        win_rep = jnp.dot(
            R2, win_ref[0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # exact in f32 for ranks < 2^24

        # row (c, o): keep lane o only — cotangent AND winner rank
        lane_o = jax.lax.broadcasted_iota(jnp.int32, (P, c_out_pad), 1)
        row_o = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (P, c_out_pad), 0), c_out_pad
        )
        onehot = lane_o == row_o
        d_out = jnp.where(onehot, g_rep, 0.0)  # (P, c_out_pad) f32
        rel = jnp.sum(
            jnp.where(onehot, win_rep, 0.0), axis=1, keepdims=True
        ).astype(jnp.int32) - win_start  # (P, 1) window-relative winner row
        wlane = jax.lax.broadcasted_iota(jnp.int32, (P, _LANE), 1)

        def s_chunk(j):
            """(P, 128) bf16 selection: S[r, i] = 1 iff window row
            j*128 + i is row r's winner. Rows with out-of-window ranks
            (zero-cotangent defaults) select nothing in every chunk."""
            return jnp.where(
                wlane == rel - j * _LANE, 1.0, 0.0
            ).astype(jnp.bfloat16)

        # ---- gather winner rows: A_w = S @ window (exact: one 1 per row)
        aw = None
        for j in range(n_chunks):
            part = jnp.dot(
                s_chunk(j), a_win[pl.ds(j * _LANE, _LANE), :],
                preferred_element_type=jnp.float32,
            )
            aw = part if aw is None else aw + part
        h0_pre = aw + bc_rep  # matches the forward's f32 add bit-for-bit
        hs = [jnp.maximum(h0_pre, 0.0).astype(jnp.bfloat16)]
        stats = {}
        for li in range(1, n_layers - 1):
            h_pre = (
                jnp.dot(
                    hs[-1], p_refs[("w", li)][:, :],
                    preferred_element_type=jnp.float32,
                )
                + p_refs[("b", li)][:, :]
            )
            c_real = widths[li]
            mean, var = _ln_stats(h_pre, c_real)
            rstd = jax.lax.rsqrt(var + 1e-5)
            xhat = (h_pre - mean) * rstd
            out = xhat * p_refs[("scale", li)][:, :] + p_refs[("lnb", li)][:, :]
            stats[li] = (xhat, rstd)
            hs.append(jnp.maximum(out, 0.0).astype(jnp.bfloat16))

        # ---- backward (same structure as the windowed kernel's tile body)
        last = n_layers - 1
        d_bf = d_out.astype(jnp.bfloat16)
        o_refs[("dw", last)][:, :] += jax.lax.dot_general(
            hs[last - 1], d_bf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_refs[("db", last)][:, :] += jnp.sum(d_out, axis=0, keepdims=True)
        dh = jnp.dot(
            d_bf, p_refs[("wt", last)][:, :],
            preferred_element_type=jnp.float32,
        )
        for li in range(n_layers - 2, 0, -1):
            xhat, rstd = stats[li]
            c_real = widths[li]
            dln = jnp.where(hs[li].astype(jnp.float32) > 0.0, dh, 0.0)
            o_refs[("ds", li)][:, :] += jnp.sum(
                dln * xhat, axis=0, keepdims=True
            )
            o_refs[("dlb", li)][:, :] += jnp.sum(dln, axis=0, keepdims=True)
            dxhat = dln * p_refs[("scale", li)][:, :]
            m1 = jnp.sum(dxhat, axis=1, keepdims=True) / c_real
            m2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True) / c_real
            dx = rstd * (dxhat - m1 - xhat * m2)
            if c_real != dx.shape[-1]:
                lane = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 1)
                dx = jnp.where(lane < c_real, dx, 0.0)
            dx_bf = dx.astype(jnp.bfloat16)
            o_refs[("dw", li)][:, :] += jax.lax.dot_general(
                hs[li - 1], dx_bf,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_refs[("db", li)][:, :] += jnp.sum(dx, axis=0, keepdims=True)
            dh = jnp.dot(
                dx_bf, p_refs[("wt", li)][:, :],
                preferred_element_type=jnp.float32,
            )
        dh0 = jnp.where(h0_pre > 0, dh, 0.0)  # (P, c1_pad) f32
        # db_c: exact f32 segment sums over each center's c_out_pad rows
        dbc_ref[0] = jnp.concatenate(
            [
                jnp.sum(
                    dh0[c * c_out_pad:(c + 1) * c_out_pad, :],
                    axis=0, keepdims=True,
                )
                for c in range(cm)
            ],
            axis=0,
        )
        # ---- scatter dA back through the selection transpose: window row i
        # of chunk j receives the sum of dh0 rows whose winner it is
        dh0_bf = dh0.astype(jnp.bfloat16)
        for j in range(n_chunks):
            da_acc[pl.ds(j * _LANE, _LANE), :] += jax.lax.dot_general(
                s_chunk(j), dh0_bf,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        read = pltpu.make_async_copy(
            da_out.at[b, pl.ds(win_start, W), :], rmw_buf, sem_rmw
        )
        read.start()
        read.wait()
        rmw_buf[:, :] += da_acc[:, :]
        write = pltpu.make_async_copy(
            rmw_buf, da_out.at[b, pl.ds(win_start, W), :], sem_rmw
        )
        write.start()
        write.wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("window", "block", "wc", "interpret", "compact")
)
def sa_pair_pool_bwd_pallas(
    A: jnp.ndarray,
    b_c: jnp.ndarray,
    g: jnp.ndarray,
    winners: jnp.ndarray,
    starts: jnp.ndarray,
    layer_params: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    *,
    window: int,
    block: int = 16,
    wc: int = 128,
    interpret: bool = False,
    compact: bool = False,
):
    """Fused backward of ``sa_pair_pool_pallas`` (see ``_make_bwd_kernel``).

    With ``compact=True`` the winner-compact kernel runs instead
    (``_make_bwd_compact_kernel``): pair rows become (center, out_channel)
    winner slots — W / c_out_pad x less recompute — gathered/scattered via
    selection matmuls. Requires ``window % 128 == 0``; profitable when
    c_out_pad < window (SA1: 8x fewer pair rows).

    Args:
        A: (B, N, c1) per-point projections — same array the forward saw.
        b_c: (B, M, c1) per-center offsets (M = n_blocks * block, rank order).
        g: (B, M, c_out) f32 cotangent of the pooled pre-activations.
        winners: (B, M, c_out) int32 winning global rank per (center, channel)
            from the forward's ``with_winners`` export.
        starts: (B, M // block) int32 window starts (same values the forward
            used; re-quantized to 16 internally).
        layer_params: as the forward — layer 0's slots are plumbing only.

    Returns:
        (dA, db_c, dkernels, dbiases, dln_scales, dln_biases) where dkernels /
        dbiases cover layers 1..L-1 and dln_* the interior layers only —
        exactly the differentiable leaves the pool consumes inside the kernel.
    """
    B, N, c1 = A.shape
    M = b_c.shape[1]
    widths = tuple(
        [layer_params[0][2].shape[-1]]
        + [p[0].shape[1] for p in layer_params[1:]]
    )
    n_layers = len(widths)
    n_blocks = M // block
    assert M % block == 0 and window % wc == 0 and N >= window
    c_out = widths[-1]
    c_out_pad = _ceil_lane(c_out)
    c1_pad = _ceil_lane(c1)

    flat_params = []
    flat_specs = []
    for li in range(1, n_layers):
        kk, bias, scale, lnb = layer_params[li]
        k_pad = _pad_lanes(
            jnp.pad(kk, ((0, _ceil_lane(kk.shape[0]) - kk.shape[0]), (0, 0))),
            _ceil_lane(kk.shape[1]),
        ).astype(jnp.bfloat16)
        flat_params += [
            k_pad,
            k_pad.T,
            _pad_lanes(bias.reshape(1, -1), _ceil_lane(len(bias))).astype(jnp.float32),
        ]
        flat_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        if li < n_layers - 1:
            flat_params += [
                _pad_lanes(scale.reshape(1, -1), _ceil_lane(len(scale))).astype(jnp.float32),
                _pad_lanes(lnb.reshape(1, -1), _ceil_lane(len(lnb))).astype(jnp.float32),
            ]
            flat_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2

    a_pad = _pad_lanes(A, c1_pad).astype(jnp.bfloat16)
    bc_pad = _pad_lanes(b_c, c1_pad).astype(jnp.bfloat16)
    g_pad = _pad_lanes(g.astype(jnp.float32), c_out_pad)
    win_pad = _pad_lanes(winners.astype(jnp.int32), c_out_pad)
    if compact:
        assert window % _LANE == 0, (window, "compact bwd tiles S by 128")
        rep = c_out_pad  # pair rows are (center, out_channel) slots
    else:
        rep = wc
    R2 = jnp.asarray(
        np.kron(np.eye(block, dtype=np.float32), np.ones((rep, 1), np.float32))
    )
    starts = (starts // 16) * 16
    da_init = jnp.zeros((B, N, c1_pad), jnp.float32)

    blk_map = lambda b, blk, starts: (b, blk, 0)  # noqa: E731
    const_map = lambda b, blk, starts: (0, 0)  # noqa: E731
    out_shapes = [
        jax.ShapeDtypeStruct((B, N, c1_pad), jnp.float32),  # dA
        jax.ShapeDtypeStruct((B, M, c1_pad), jnp.float32),  # db_c
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, block, c1_pad), blk_map, memory_space=pltpu.VMEM),
    ]
    for li in range(1, n_layers):
        cin_pad = _ceil_lane(layer_params[li][0].shape[0])
        cw_pad = _ceil_lane(widths[li])
        out_shapes += [
            jax.ShapeDtypeStruct((cin_pad, cw_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, cw_pad), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((cin_pad, cw_pad), const_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cw_pad), const_map, memory_space=pltpu.VMEM),
        ]
        if li < n_layers - 1:
            out_shapes += [
                jax.ShapeDtypeStruct((1, cw_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, cw_pad), jnp.float32),
            ]
            out_specs += [
                pl.BlockSpec((1, cw_pad), const_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cw_pad), const_map, memory_space=pltpu.VMEM),
            ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # a_pad (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # da_init (aliased to dA)
            pl.BlockSpec((1, block, c1_pad), blk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, c_out_pad), blk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, c_out_pad), blk_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # R2
        ] + flat_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, window, c1_pad), jnp.bfloat16),  # a windows
            pltpu.VMEM((window, c1_pad), jnp.float32),  # dA accumulator
            pltpu.VMEM((window, c1_pad), jnp.float32),  # RMW buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    if compact:
        kernel = _make_bwd_compact_kernel(widths, window, block)
    else:
        kernel = _make_bwd_kernel(widths, window, wc, block)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # the tile recompute+backward keeps several (block*wc, C_pad) f32
        # temporaries live at once; the 16M default scoped budget is within
        # ~1M of the SA2 working set, so give Mosaic explicit headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        # args: starts(scalar-prefetch), a_pad, da_init, ... — da_init (index
        # 2 in the flattened input list) aliases output 0 so the kernel can
        # read-modify-write it in place.
        input_output_aliases={2: 0},
        interpret=interpret,
    )(
        starts.reshape(-1).astype(jnp.int32),
        a_pad,
        da_init,
        bc_pad,
        g_pad,
        win_pad,
        R2,
        *flat_params,
    )
    dA = outs[0][..., :c1]
    dbc = outs[1][..., :c1]
    dk, db, ds, dlb = [], [], [], []
    k = 2
    for li in range(1, n_layers):
        cin = layer_params[li][0].shape[0]
        dk.append(outs[k][:cin, :widths[li]])
        db.append(outs[k + 1][0, :widths[li]])
        k += 2
        if li < n_layers - 1:
            ds.append(outs[k][0, :widths[li]])
            dlb.append(outs[k + 1][0, :widths[li]])
            k += 2
    return dA, dbc, tuple(dk), tuple(db), tuple(ds), tuple(dlb)


def sa_pair_pool_pallas(
    A: jnp.ndarray,
    xyz_sorted: jnp.ndarray,
    b_c: jnp.ndarray,
    cen_xyz: jnp.ndarray,
    starts: jnp.ndarray,
    layer_params: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    *,
    radius: float,
    window: int,
    block: int = 16,
    wc: int = 128,
    interpret: bool = False,
    with_winners: bool = False,
    d2_mode: str | None = None,
):
    """Resolve ``d2_mode`` (call-time env default) then dispatch to the jitted
    impl — resolution outside jit so an env change can't hit a stale trace."""
    return _sa_pair_pool_impl(
        A, xyz_sorted, b_c, cen_xyz, starts, layer_params,
        radius=radius, window=window, block=block, wc=wc,
        interpret=interpret, with_winners=with_winners,
        d2_mode=_resolve_d2_mode(d2_mode),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "window", "block", "wc", "interpret", "with_winners",
        "d2_mode",
    ),
)
def _sa_pair_pool_impl(
    A: jnp.ndarray,
    xyz_sorted: jnp.ndarray,
    b_c: jnp.ndarray,
    cen_xyz: jnp.ndarray,
    starts: jnp.ndarray,
    layer_params: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    *,
    radius: float,
    window: int,
    block: int = 16,
    wc: int = 128,
    interpret: bool = False,
    with_winners: bool = False,
    d2_mode: str = _D2_DEFAULT,
) -> jnp.ndarray:
    """Windowed masked-max pair MLP (see module docstring).

    Args:
        A: (B, N, c1) per-point layer-1 projections (bias folded in).
        xyz_sorted: (B, N, 3) f32 sorted coordinates.
        b_c: (B, M, c1) per-center offsets (centers in rank order).
        cen_xyz: (B, M, 3) f32 center coordinates (rank order).
        starts: (B, M // block) int32 window starts; quantized down to
            multiples of 16 (the sublane tile: bf16 packs (16, 128)) for
            DMA alignment — 128 was overly conservative and mis-centered
            short windows (W=64 shifts by up to 127).
        layer_params: per layer (kernel, bias, ln_scale, ln_bias). Layer 0's
            kernel/bias are folded into A/b_c by the caller and its LN runs
            on the point grid outside (A arrives pre-normalized); the LAST
            layer's LN+ReLU runs on the pooled centers outside. Their
            (ln_scale, ln_bias) slots are ignored — pass identity.

    Returns:
        (B, M, c_out) f32 pooled last-layer PRE-activations (same center
        order as inputs); centers with no in-radius point in their window
        hold -1e9 (callers max in the self term, which overrides the fill,
        then apply the final LN+ReLU). With ``with_winners`` also an
        (B, M, c_out) int32 array of the winning point's global rank per
        (center, out_channel) — fuel for the sparse winner-recompute
        backward (``ops/fused_sa.py:_winner_pool``).
    """
    B, N, c1 = A.shape
    M = b_c.shape[1]
    widths = tuple(
        [layer_params[0][2].shape[-1]]
        + [p[0].shape[1] for p in layer_params[1:]]
    )
    n_blocks = M // block
    assert M % block == 0 and window % wc == 0 and N >= window
    c_out = widths[-1]
    c_out_pad = _ceil_lane(c_out)
    c1_pad = _ceil_lane(c1)

    flat_params = []
    flat_specs = []
    for li, (k, bias, scale, lnb) in enumerate(layer_params):
        if li == 0:
            k_pad = jnp.zeros((1, 1), jnp.bfloat16)  # unused (folded into A)
        else:
            k_pad = _pad_lanes(
                jnp.pad(k, ((0, _ceil_lane(k.shape[0]) - k.shape[0]), (0, 0))),
                _ceil_lane(k.shape[1]),
            ).astype(jnp.bfloat16)
        flat_params += [
            k_pad,
            _pad_lanes(bias.reshape(1, -1), _ceil_lane(len(bias))).astype(jnp.float32),
            _pad_lanes(scale.reshape(1, -1), _ceil_lane(len(scale))).astype(jnp.float32),
            _pad_lanes(lnb.reshape(1, -1), _ceil_lane(len(lnb))).astype(jnp.float32),
        ]
        flat_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4

    a_pad = _pad_lanes(A, c1_pad).astype(jnp.bfloat16)
    bc_pad = _pad_lanes(b_c, c1_pad).astype(jnp.bfloat16)

    # 0/1 center-expansion matrix (center-major): R2[c*wc + p, c] = 1. f32 so
    # replicated coordinates stay exact for the radius test.
    R2 = jnp.asarray(
        np.kron(np.eye(block, dtype=np.float32), np.ones((wc, 1), np.float32))
    )  # (block*wc, block)

    starts = (starts // 16) * 16

    kernel = _make_kernel(
        widths, window, wc, block, radius * radius,
        with_winners=with_winners, d2_mode=d2_mode,
    )
    out_spec = pl.BlockSpec(
        (1, block, c_out_pad), lambda b, blk, *s: (b, blk, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((B, M, c_out_pad), jnp.float32)
    scratch = [
        pltpu.VMEM((2, window, c1_pad), jnp.bfloat16),
    ]
    if d2_mode != "pre":
        scratch.append(pltpu.VMEM((2, window, _LANE), jnp.float32))
    scratch.append(pltpu.VMEM((block, c_out_pad), jnp.float32))
    if with_winners:
        out_spec = [out_spec, out_spec]
        out_shape = [
            out_shape, jax.ShapeDtypeStruct((B, M, c_out_pad), jnp.int32)
        ]
        scratch.append(pltpu.VMEM((block, c_out_pad), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if d2_mode != "pre":
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if d2_mode == "pre":
        from eda_tpu.ops.pallas.sa_mask import mask_window, sa_radius_mask

        pen, offs = sa_radius_mask(
            xyz_sorted,
            cen_xyz[..., :3],
            starts,
            radius=radius,
            window=window,
            block=block,
            interpret=interpret,
        )
        wp = mask_window(window)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # starts16, offs
            grid=(B, n_blocks),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # a_pad (HBM)
                pl.BlockSpec(
                    (1, block, c1_pad), lambda b, blk, *s: (b, blk, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, wp, block), lambda b, blk, *s: (b, blk, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # R2
            ] + flat_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            starts.reshape(-1).astype(jnp.int32),
            offs.reshape(-1).astype(jnp.int32),
            a_pad,
            bc_pad,
            pen,
            R2,
            *flat_params,
        )
    else:
        xyz_pad = _pad_lanes(xyz_sorted, _LANE).astype(jnp.float32)
        cen_pad = _pad_lanes(cen_xyz, _LANE).astype(jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_blocks),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # a_pad (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # xyz_pad (HBM)
                pl.BlockSpec(
                    (1, block, c1_pad), lambda b, blk, starts: (b, blk, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block, _LANE), lambda b, blk, starts: (b, blk, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # R2
            ] + flat_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            starts.reshape(-1).astype(jnp.int32),
            a_pad,
            xyz_pad,
            bc_pad,
            cen_pad,
            R2,
            *flat_params,
        )
    if with_winners:
        return out[0][..., :c_out], out[1][..., :c_out]
    return out[..., :c_out]
