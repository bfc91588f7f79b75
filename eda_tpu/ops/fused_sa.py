"""Fused set abstraction: neighborhood MLP + pooling without neighbor indices.

The reference SA layer (``pointnet2_modules.py:210-272``) is
ball-query -> gather -> shared MLP -> max-pool. On TPU the ball query's
top-k selection costs ~1s per batch at SA1 sizes and the per-neighbor gather
materializes ragged access patterns XLA hates. This module reformulates the
layer to need *no neighbor indices at all*:

    out_c = max over { p : ||x_p - x_c|| <= r } of MLP([ (x_p - x_c)/r ; f_p ])

computed as dense center x point blocks with a radius mask. Two exploits make
this cheap:

1. **Separable first layer.** Layer 1 is linear in its input, so
   ``W1 @ [dx;f] = A_p + b_c`` with a per-point projection ``A_p`` (one dense
   N x C matmul) and a per-center offset ``b_c``. Only layers 2..k run on
   center x point pairs.
2. **Spatial windows.** Points are sorted along a Morton (Z-order) curve via
   multi-operand ``lax.sort`` (gather-free, ~free on TPU); in sorted order a
   ball's members live in a short contiguous window, so each block of
   (rank-sorted) centers only pairs with a ``window``-length slice instead of
   all N points. ``window >= N`` degrades gracefully to the exact dense form
   (used for SA2-4 where N <= 2048).

Deviations from the reference, both deliberate TPU-first choices:
* the neighborhood is *all* in-radius points in the window, not a <=nsample
  subsample (the cap is a GPU memory artifact; max-pooling over more points
  is statistically a superset). Morton windows cover the large majority of
  true neighbors; the window size trades coverage for FLOPs.
* normalization inside the pair MLP is LayerNorm (per-sample, fusable,
  identical in train/eval) rather than BatchNorm — batch statistics over the
  dense masked pair grid would need multi-pass reductions that defeat the
  fusion. The gather-based exact path (``models/pointnet2.py``) keeps BN.
* norm placement is chosen so that per-row LayerNorm stats run on the pair
  grid as rarely as possible (measured: each pair-grid LN costs as much as
  the whole MXU pair MLP):
  - layer 0 pre-norms the per-point projection ``LN(A_p)`` on the (B, N)
    point grid OUTSIDE the pair compute, then ``relu(LN(A_p) + b_c)``;
  - interior layers keep LN+ReLU on the pair grid;
  - the LAST layer max-pools its PRE-activations and applies LN+ReLU per
    center afterwards (M rows, not M x W).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_NEG = -1e9
# Winner-compact Pallas backward toggle (tests flip it to pin down the
# windowed backward; see _pallas_train_pool.bwd).
_COMPACT_BWD = True
# Forward pair-tile rows (window points per tile). None = min(128, W).
_FWD_WC = None


def morton_keys(xyz: jnp.ndarray, cell_size: float, origin: float = -50.0) -> jnp.ndarray:
    """Z-order (Morton) key per point: interleaved 10-bit cell coordinates.

    Locality in all three axes, unlike row-major keys which only localize
    the major axis. (..., 3) -> (...,) int32.
    """
    cells = jnp.clip(
        jnp.floor((xyz - origin) / cell_size).astype(jnp.uint32), 0, 1023
    )

    def spread(v):
        # spread 10 bits: abcdefghij -> a__b__c__d__e__f__g__h__i__j
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    key = (
        spread(cells[..., 0])
        | (spread(cells[..., 1]) << 1)
        | (spread(cells[..., 2]) << 2)
    )
    return key.astype(jnp.int32)


class SAParams(NamedTuple):
    """Parameters of one fused SA layer (k dense stages).

    kernels[i]: (C_in_i, C_out_i); biases[i]: (C_out_i,);
    ln_scales[i] / ln_biases[i]: (C_out_i,).
    Layer 0's input is [dxyz/r ; features], so kernels[0] has 3 + C rows.
    """

    kernels: Tuple[jnp.ndarray, ...]
    biases: Tuple[jnp.ndarray, ...]
    ln_scales: Tuple[jnp.ndarray, ...]
    ln_biases: Tuple[jnp.ndarray, ...]


def _ln(x, scale, bias, eps=1e-5):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _act_ln(x, scale, bias):
    return jax.nn.relu(_ln(x, scale, bias))


def _ln_padded(x, scale, bias, *, c_real: int, eps=1e-5):
    """LayerNorm over the first ``c_real`` lanes of a lane-padded ``x``.

    Relies on the Pallas-kernel invariant that padding lanes are EXACTLY zero
    (weight columns / bias / scale are zero-padded), so full-width sums equal
    real-lane sums and padding lanes stay zero after normalization — the same
    trick as ``ops/pallas/sa_kernel._ln_stats``.
    """
    x = x.astype(jnp.float32)
    s1 = jnp.sum(x, axis=-1, keepdims=True)
    s2 = jnp.sum(x * x, axis=-1, keepdims=True)
    mean = s1 / c_real
    var = jnp.maximum(s2 / c_real - mean * mean, 0.0)
    # zero-padded ``scale``/``bias`` force padding lanes back to exactly zero
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _scan_pool(
    A, sxyz, b_c, cen_xyz, ranks_f, kernels, biases, ln_scales, ln_biases,
    *, statics, with_winners: bool = False,
):
    """Differentiable windowed masked-max pair MLP: scan over center blocks.

    ``A`` is the PRE-NORMALIZED per-point projection ``LN(pts @ W1 + b1)``
    (layer 0's LN runs on the point grid outside this function); the last
    layer's output is pooled PRE-activation, and the caller applies the final
    LN+ReLU per center. ``ranks_f`` is float (int cotangents are awkward in
    custom_vjp); windows derive from it. Returns (B, n_blocks*block, c_out)
    pre-activations in rank order; with ``with_winners`` also the winning
    point's GLOBAL rank per (center, out_channel) — (B, n_blocks*block,
    c_out) int32 — for the sparse winner-recompute backward.
    """
    radius, W, block, n_blocks, dense, compute_dtype = statics
    r2 = radius * radius
    B, N, _ = A.shape
    ranks = ranks_f.astype(jnp.int32)
    kers = [k.astype(compute_dtype) for k in kernels]
    bias = [b.astype(compute_dtype) for b in biases]

    # Rematerialized per-block compute: without checkpointing, autodiff of
    # the scan stores every block's (B, cm, W, C) pair tensors as residuals
    # (tens of GB at SA1 sizes); with it, backward recomputes each block.
    @jax.checkpoint
    def block_compute(a_win, xyz_win, bc_blk, cen_blk, ln_params):
        scales, lbiases = ln_params
        h = jax.nn.relu(
            a_win[:, None, :, :] + bc_blk[:, :, None, :]
        ).astype(compute_dtype)  # (B, cm, W, c1)
        for i, (k, b) in enumerate(zip(kers, bias)):
            h = h @ k + b
            if i + 1 < len(kers):  # interior layers: LN+ReLU on the pair grid
                h = _act_ln(h, scales[i], lbiases[i]).astype(compute_dtype)
        d2 = jnp.sum(
            (xyz_win[:, None, :, :] - cen_blk[:, :, None, :]) ** 2, axis=-1
        )  # (B, cm, W)
        masked = jnp.where(d2[..., None] <= r2, h.astype(jnp.float32), _NEG)
        out = jnp.max(masked, axis=2)  # (B, cm, c_out) pre-activation
        if not with_winners:
            return out, None
        return out, jnp.argmax(masked, axis=2).astype(jnp.int32)

    def block_fn(_, bi):
        mid = jax.lax.dynamic_slice_in_dim(ranks, bi * block + block // 2, 1, 1)
        start = jnp.clip(mid[:, 0] - W // 2, 0, N - W)  # (B,)
        if dense:
            start = jnp.zeros_like(start)
        a_win = jax.vmap(
            lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, W, axis=0)
        )(A, start)  # (B, W, c1)
        xyz_win = jax.vmap(
            lambda a, s: jax.lax.dynamic_slice_in_dim(a, s, W, axis=0)
        )(sxyz, start)  # (B, W, 3)
        bc_blk = jax.lax.dynamic_slice_in_dim(b_c, bi * block, block, 1)
        cen_blk = jax.lax.dynamic_slice_in_dim(cen_xyz, bi * block, block, 1)
        out, win = block_compute(
            a_win, xyz_win, bc_blk, cen_blk, (ln_scales, ln_biases)
        )
        if with_winners:
            win = win + start[:, None, None]  # window pos -> global rank
        return _, (out, win)

    _, (outs, wins) = jax.lax.scan(block_fn, 0, jnp.arange(n_blocks))
    outs = jnp.swapaxes(outs, 0, 1).reshape(B, n_blocks * block, -1)
    if not with_winners:
        return outs
    wins = jnp.swapaxes(wins, 0, 1).reshape(B, n_blocks * block, -1)
    return outs, wins


@functools.lru_cache(maxsize=None)
def _winner_pool(statics):
    """custom_vjp pool with the winner-recompute backward.

    Forward: the XLA scan additionally records, per (center, out_channel),
    the GLOBAL rank of the point that won the masked max. Backward: instead
    of rematerializing the full (B, cm, W, C) pair grid (3 passes over W
    pairs per center), recompute the pair MLP only at the <= c_out winner
    pairs per center and route cotangents through the diagonal — W/c_out x
    less backward pair work (8x at SA1's W=1024, c_out=128). Only used when
    c_out < W; tie-breaking matches XLA's max subgradient up to ties between
    equal values (measure-zero for float activations).
    """
    radius, W, block, n_blocks, dense, compute_dtype = statics

    @jax.custom_vjp
    def pool(A, sxyz, b_c, cen_xyz, ranks_f, kernels, biases, ln_scales,
             ln_biases):
        return _scan_pool(
            A, sxyz, b_c, cen_xyz, ranks_f, kernels, biases, ln_scales,
            ln_biases, statics=statics,
        )

    def fwd(A, sxyz, b_c, cen_xyz, ranks_f, kernels, biases, ln_scales,
            ln_biases):
        outs, winners = _scan_pool(
            A, sxyz, b_c, cen_xyz, ranks_f, kernels, biases, ln_scales,
            ln_biases, statics=statics, with_winners=True,
        )
        return outs, (A, b_c, winners, kernels, biases, ln_scales, ln_biases)

    def bwd(res, g):
        A, b_c, winners, kernels, biases, ln_scales, ln_biases = res
        B, N, c1 = A.shape
        K = winners.shape[-1]  # = c_out
        kers_dt = compute_dtype

        def f_all(A_, bc_, kernels_, biases_, scales_, lbiases_):
            kers = [k.astype(kers_dt) for k in kernels_]
            bias = [b.astype(kers_dt) for b in biases_]

            @jax.checkpoint
            def blk_compute(a_w, bc_blk, ln_params):
                scales, lbiases = ln_params
                h = jax.nn.relu(
                    a_w + bc_blk[:, :, None, :]
                ).astype(kers_dt)  # (B, cm, K, c1)
                for i, (k, b) in enumerate(zip(kers, bias)):
                    h = h @ k + b
                    if i + 1 < len(kers):
                        h = _act_ln(h, scales[i], lbiases[i]).astype(kers_dt)
                # winner slot k feeds exactly out-channel k
                return jnp.diagonal(
                    h.astype(jnp.float32), axis1=2, axis2=3
                )  # (B, cm, c_out)

            def blk(_, bi):
                w_blk = jax.lax.dynamic_slice_in_dim(
                    winners, bi * block, block, 1
                )  # (B, cm, K)
                bc_blk = jax.lax.dynamic_slice_in_dim(bc_, bi * block, block, 1)
                a_w = jnp.take_along_axis(
                    A_, w_blk.reshape(B, -1, 1), axis=1
                ).reshape(B, block, K, c1)
                return _, blk_compute(a_w, bc_blk, (scales_, lbiases_))

            _, outs = jax.lax.scan(blk, 0, jnp.arange(n_blocks))
            return jnp.swapaxes(outs, 0, 1).reshape(B, n_blocks * block, -1)

        _, vjp = jax.vjp(f_all, A, b_c, kernels, biases, ln_scales, ln_biases)
        # Cotangents for out-of-radius centers (winner = masked argmax over
        # all-NEG rows, pinned to window slot 0) are already zero: the outer
        # maximum() with the self term routes their gradient away.
        dA, dbc, dk, db, ds, dlb = vjp(g)
        Mp = b_c.shape[1]
        return (
            dA,
            jnp.zeros((B, N, 3), jnp.float32),  # sxyz: geometry, not trained
            dbc,
            jnp.zeros((B, Mp, 3), jnp.float32),  # cen_xyz
            jnp.zeros((B, Mp), jnp.float32),  # ranks_f
            dk, db, ds, dlb,
        )

    pool.defvjp(fwd, bwd)
    return pool


def _pallas_starts(ranks_f, statics, N):
    """Window starts exactly as the Pallas primal derives them (pb-blocked,
    midpoint-centered, clipped; the fwd and bwd kernels re-quantize to 16,
    the bf16 sublane tile — see commit 6698280)."""
    radius, W, block, n_blocks, dense, compute_dtype = statics
    ranks = ranks_f.astype(jnp.int32)
    B = ranks_f.shape[0]
    m_total = n_blocks * block
    pb = 16 if m_total % 16 == 0 else 8
    mids = ranks[:, :m_total].reshape(B, m_total // pb, pb)[:, :, pb // 2]
    p_starts = jnp.clip(mids - W // 2, 0, N - W).astype(jnp.int32)
    if dense:
        p_starts = jnp.zeros_like(p_starts)
    return p_starts, pb, min(128, W)


@functools.lru_cache(maxsize=None)
def _pallas_train_pool(statics):
    """custom_vjp pool: Pallas forward AND fused Pallas backward.

    The forward kernel runs with winner export; the backward kernel
    (``ops/pallas/sa_kernel.py:sa_pair_pool_bwd_pallas``) re-streams the same
    windows, recomputes each pair tile once in VMEM, and routes cotangents
    through the winner indices — no pair-grid rematerialization in HBM and no
    sparse gathers (the failure mode of the ``winner`` XLA path). This is the
    TPU training default.
    """
    radius, W, block, n_blocks, dense, compute_dtype = statics

    def primal(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels, biases,
               ln_scales, ln_biases):
        from eda_tpu.ops.pallas.sa_kernel import sa_pair_pool_pallas

        N = A.shape[1]
        p_starts, pb, wcp = _pallas_starts(ranks_f, statics, N)
        layer_params = [(k0, b0, jnp.ones_like(b0), jnp.zeros_like(b0))]
        for i, (k, b) in enumerate(zip(kernels, biases)):
            if i < len(kernels) - 1:
                s, lb = ln_scales[i], ln_biases[i]
            else:
                s, lb = jnp.ones_like(b), jnp.zeros_like(b)
            layer_params.append((k, b, s, lb))
        return sa_pair_pool_pallas(
            A, sxyz, b_c, cen_xyz, p_starts, layer_params,
            radius=radius, window=W, block=pb,
            wc=(_FWD_WC if _FWD_WC and W % _FWD_WC == 0 else wcp),
            with_winners=True,
        )

    @jax.custom_vjp
    def pool(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels, biases,
             ln_scales, ln_biases):
        return primal(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels,
                      biases, ln_scales, ln_biases)[0]

    def fwd(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels, biases,
            ln_scales, ln_biases):
        out, winners = primal(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0,
                              kernels, biases, ln_scales, ln_biases)
        return out, (A, sxyz, b_c, cen_xyz, ranks_f, winners, k0, b0,
                     kernels, biases, ln_scales, ln_biases)

    def bwd(res, g):
        (A, sxyz, b_c, cen_xyz, ranks_f, winners, k0, b0, kernels, biases,
         ln_scales, ln_biases) = res
        from eda_tpu.ops.pallas.sa_kernel import (
            _ceil_lane, sa_pair_pool_bwd_pallas,
        )

        N = A.shape[1]
        p_starts, pb, wcp = _pallas_starts(ranks_f, statics, N)
        layer_params = [(k0, b0, jnp.ones_like(b0), jnp.zeros_like(b0))]
        for i, (k, b) in enumerate(zip(kernels, biases)):
            if i < len(kernels) - 1:
                s, lb = ln_scales[i], ln_biases[i]
            else:
                s, lb = jnp.ones_like(b), jnp.zeros_like(b)
            layer_params.append((k, b, s, lb))
        # Winner-compact backward when the winner-slot grid (c_out_pad rows
        # per center) is smaller than the window grid (W rows) — 8x less
        # backward pair work at SA1 (W=1024, c_out=128). See
        # sa_kernel._make_bwd_compact_kernel.
        compact = (
            _COMPACT_BWD
            and W % 128 == 0
            and _ceil_lane(winners.shape[-1]) < W
        )
        dA, dbc, dk, db, ds, dlb = sa_pair_pool_bwd_pallas(
            A, b_c, g, winners, p_starts, layer_params,
            window=W, block=pb, wc=wcp, compact=compact,
        )
        zero = lambda x: jax.tree_util.tree_map(jnp.zeros_like, x)  # noqa: E731
        return (dA.astype(A.dtype), zero(sxyz), dbc.astype(b_c.dtype),
                zero(cen_xyz), zero(ranks_f), zero(k0), zero(b0),
                dk, db, ds, dlb)

    pool.defvjp(fwd, bwd)
    return pool


@functools.lru_cache(maxsize=None)
def _hybrid_pool(statics):
    """custom_vjp pool: Pallas-kernel forward, recompute-XLA-scan backward.

    The kernel has no VJP; differentiating through the scan in the backward
    keeps training correct while the primal gets the fast path (and matches
    what serving computes).
    """
    radius, W, block, n_blocks, dense, compute_dtype = statics

    def primal(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels, biases,
               ln_scales, ln_biases):
        from eda_tpu.ops.pallas.sa_kernel import sa_pair_pool_pallas

        ranks = ranks_f.astype(jnp.int32)
        B = A.shape[0]
        N = A.shape[1]
        m_total = n_blocks * block
        pb = 16 if m_total % 16 == 0 else 8
        wcp = min(128, W)
        mids = ranks[:, :m_total].reshape(B, m_total // pb, pb)[:, :, pb // 2]
        p_starts = jnp.clip(mids - W // 2, 0, N - W).astype(jnp.int32)
        if dense:
            p_starts = jnp.zeros_like(p_starts)
        # ln_scales/ln_biases hold INTERIOR layers only; layer 0's LN runs on
        # the point grid outside and the last layer's after pooling. The
        # kernel interface still takes one (scale, bias) pair per layer (the
        # widths derive from them), so pad the unused slots with identity.
        layer_params = [(k0, b0, jnp.ones_like(b0), jnp.zeros_like(b0))]
        for i, (k, b) in enumerate(zip(kernels, biases)):
            if i < len(kernels) - 1:
                s, lb = ln_scales[i], ln_biases[i]
            else:
                s, lb = jnp.ones_like(b), jnp.zeros_like(b)
            layer_params.append((k, b, s, lb))
        return sa_pair_pool_pallas(
            A, sxyz, b_c, cen_xyz, p_starts, layer_params,
            radius=radius, window=W, block=pb, wc=wcp,
        )

    @jax.custom_vjp
    def pool(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels, biases,
             ln_scales, ln_biases):
        return primal(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels,
                      biases, ln_scales, ln_biases)

    def fwd(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels, biases,
            ln_scales, ln_biases):
        out = primal(A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels,
                     biases, ln_scales, ln_biases)
        return out, (A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels,
                     biases, ln_scales, ln_biases)

    def bwd(res, g):
        (A, sxyz, b_c, cen_xyz, ranks_f, k0, b0, kernels, biases, ln_scales,
         ln_biases) = res

        def f(A_, bc_, kernels_, biases_, scales_, lbiases_):
            # A / b_c may arrive lane-padded for the Pallas primal; the XLA
            # scan multiplies against the UNPADDED layer kernels, so slice
            # back to the real width (padding lanes are exactly zero and
            # carry no gradient).
            c1_real = kernels_[0].shape[0]
            return _scan_pool(
                A_[..., :c1_real], sxyz[..., :3], bc_[..., :c1_real],
                cen_xyz, ranks_f,
                kernels_, biases_, scales_, lbiases_, statics=statics,
            )

        _, vjp = jax.vjp(f, A, b_c, kernels, biases, ln_scales, ln_biases)
        dA, dbc, dk, db, ds, dlb = vjp(g)
        zero = lambda x: jax.tree_util.tree_map(jnp.zeros_like, x)  # noqa: E731
        # k0/b0 only feed A/b_c OUTSIDE this boundary; inside they are
        # kernel-call plumbing with no gradient
        return (dA, zero(sxyz), dbc, zero(cen_xyz), zero(ranks_f),
                zero(k0), zero(b0), dk, db, ds, dlb)

    pool.defvjp(fwd, bwd)
    return pool


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "window", "block", "compute_dtype", "presorted", "impl",
        "return_rank_order",
    ),
)
def fused_set_abstraction(
    xyz: jnp.ndarray,
    features: jnp.ndarray,
    center_idx: jnp.ndarray,
    params: SAParams,
    *,
    radius: float,
    window: int,
    block: int = 64,
    compute_dtype=jnp.bfloat16,
    presorted: bool = False,
    impl: str = "xla",
    return_rank_order: bool = False,
) -> jnp.ndarray:
    """Fused SA forward.

    Args:
        xyz: (B, N, 3) float32 point coordinates.
        features: (B, N, C) float32 per-point features (C may be 0).
        center_idx: (B, M) int32 indices of the centers (e.g. FPS output).
        params: SAParams.
        radius: ball radius; window: spatial window length (>= N => exact
        dense); block: centers per block.
        presorted: points already arrive in Morton order (the input pipeline
            sorts on host — device-side multi-operand sorts are expensive to
            compile and execute). Then center indices ARE ranks and no sort
            happens on device.
        return_rank_order: also return the ascending-sorted center indices
            and keep the outputs in that (rank) order, skipping the final
            inverse gather. Morton order is hierarchical (the key at cell
            size 2s is the key at cell size s shifted right by 3), so a
            subset of a Morton-sorted cloud taken in ascending index order is
            itself Morton-sorted at every coarser grid — callers can chain SA
            layers without re-sorting between them.

    Returns:
        (B, M, C_out) float32 pooled features, aligned with center_idx order;
        with ``return_rank_order``, a tuple of (features in rank order,
        (B, M) int32 ascending center indices).
    """
    B, N, _ = xyz.shape
    M = center_idx.shape[1]
    C = features.shape[-1]
    w1 = params.kernels[0]
    assert w1.shape[0] == 3 + C, (w1.shape, C)

    if return_rank_order and not (presorted or window >= N):
        raise ValueError(
            "return_rank_order needs ranks to be input-domain indices, which "
            "only holds for presorted or dense layers"
        )
    dense = window >= N
    if dense:
        sxyz, sfeats = xyz, features
        window = N
        if return_rank_order:
            # dense windows cover everything, so order is free — emit rank
            # order to keep the Morton chain for the next layer
            ranks = jax.lax.sort(center_idx, dimension=1)
        else:
            ranks = center_idx  # any order; windows cover everything
        center_order = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    elif presorted:
        sxyz, sfeats = xyz, features
        # FPS over a sorted cloud returns sorted-domain indices == ranks.
        ranks, center_order = jax.lax.sort(
            [
                center_idx,
                jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M)),
            ],
            dimension=1,
            num_keys=1,
        )
    else:
        keys = morton_keys(xyz, radius)
        iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        ops_in = [keys, iota, xyz[..., 0], xyz[..., 1], xyz[..., 2]] + [
            features[..., c] for c in range(C)
        ]
        sorted_ops = jax.lax.sort(ops_in, dimension=1, num_keys=1)
        sxyz = jnp.stack(sorted_ops[2:5], axis=-1)
        sfeats = (
            jnp.stack(sorted_ops[5:], axis=-1)
            if C
            else jnp.zeros((B, N, 0), xyz.dtype)
        )
        inv_perm = sorted_ops[1]  # sorted position -> original index
        # rank of each center in sorted order: sort (original->sorted) pairs.
        pos_iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        _, fwd_perm = jax.lax.sort([inv_perm, pos_iota], dimension=1, num_keys=1)
        # fwd_perm[orig] = sorted position; centers are few -> cheap gather
        ranks = jnp.take_along_axis(fwd_perm, center_idx, axis=1)  # (B, M)
        # process centers in rank order; remember how to restore input order
        ranks, center_order = jax.lax.sort(
            [ranks, jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))],
            dimension=1,
            num_keys=1,
        )

    W = min(window, N)
    if impl in ("pallas", "pallas_train") and W % min(128, W) != 0:
        # the pair kernel tiles windows in wc-row slices; a window that is
        # not a multiple of the tile (e.g. dense mode at N=50000) falls back
        # to the XLA scan — dense windows are a coverage-measurement mode,
        # not the production path
        impl = "xla"

    # per-point projection A = LN([xyz/r ; f] @ W1 + b1): layer 0's LayerNorm
    # runs here on the (B, N) point grid — one fused XLA pass — instead of on
    # the (M x W) pair grid, where a single LN costs as much as the whole
    # pair MLP's matmuls (measured on v5e)
    pts_in = jnp.concatenate([sxyz / radius, sfeats], axis=-1)
    c1 = w1.shape[1]
    pool_xyz = sxyz  # what the pool functions receive as xyz
    if impl in ("pallas", "pallas_train"):
        # Pallas paths: bear A / b_c at the kernel's 128-lane width directly
        # by zero-padding W1's COLUMNS (and bias/LN params), so no separate
        # (B, N, c1)->(B, N, 128) pad / f32 convert ops run on the 50k-point
        # grid (measured ~5 ms/step at SA1, B=32). Padding lanes stay EXACTLY
        # zero through matmul+bias+LN (the kernel invariant), and the LN
        # stats divide by the REAL width using full-width sums.
        from eda_tpu.ops.pallas.sa_kernel import _ceil_lane, _pad_lanes

        c1p = _ceil_lane(c1)
        w1_eff = _pad_lanes(w1, c1p)
        b1_eff = _pad_lanes(params.biases[0].reshape(1, -1), c1p)[0]
        s1_eff = _pad_lanes(params.ln_scales[0].reshape(1, -1), c1p)[0]
        lb1_eff = _pad_lanes(params.ln_biases[0].reshape(1, -1), c1p)[0]
        ln_first = functools.partial(_ln_padded, c_real=c1)
    else:
        w1_eff, b1_eff = w1, params.biases[0]
        s1_eff, lb1_eff = params.ln_scales[0], params.ln_biases[0]
        ln_first = _ln
    from eda_tpu.ops.pallas.sa_prep import _row_block, sa_prep

    if impl in ("pallas", "pallas_train") and N % 16 == 0 and _row_block(N) <= 4096:
        # Fused layer-0 prep kernel: matmul + bias + LN + compute-dtype cast
        # + the 128-lane xyz pad in ONE pass over the point grid each way
        # (the separate XLA passes measured ~15 ms/step at SA1, B=32 —
        # including a 820 MB standalone pad op for the pair kernel's xyz
        # DMA layout). The xyz/radius division happens in-kernel at the
        # same rounding point as the XLA formulation.
        pts_raw = jnp.concatenate([sxyz, sfeats], axis=-1)
        A, pool_xyz = sa_prep(
            pts_raw,
            w1_eff,
            b1_eff.reshape(1, -1),
            s1_eff.reshape(1, -1),
            lb1_eff.reshape(1, -1),
            c_real=c1,
            radius=radius,
            compute_dtype=compute_dtype,
        )
    else:
        A = (
            pts_in.astype(compute_dtype) @ w1_eff.astype(compute_dtype)
            + b1_eff.astype(compute_dtype)
        )  # (B, N, c1 | c1_pad)
        A = ln_first(A, s1_eff, lb1_eff).astype(compute_dtype)
    # per-center offset b_c = -(x_c/r) @ W1[:3]
    # in dense/presorted modes ranks ARE indices into sxyz; in the device-sort
    # mode they are positions in the sorted domain — either way this gathers
    # the center coordinates
    cen_xyz = jnp.take_along_axis(sxyz, jnp.clip(ranks, 0, N - 1)[..., None], axis=1)
    b_c = -(cen_xyz / radius).astype(compute_dtype) @ w1_eff[:3].astype(compute_dtype)

    n_blocks = (M + block - 1) // block
    m_pad = n_blocks * block - M
    if m_pad:
        # edge-pad so the last block's window midpoint stays on a real center
        ranks = jnp.pad(ranks, ((0, 0), (0, m_pad)), mode="edge")
        b_c = jnp.pad(b_c, ((0, 0), (0, m_pad), (0, 0)))
        cen_xyz = jnp.pad(cen_xyz, ((0, 0), (0, m_pad), (0, 0)), mode="edge")
    statics = (radius, W, block, n_blocks, dense, compute_dtype)
    diff_params = (
        tuple(params.kernels[1:]),
        tuple(params.biases[1:]),
        tuple(params.ln_scales[1:-1]),  # interior pair-grid LNs only
        tuple(params.ln_biases[1:-1]),
    )
    if impl == "pallas_train":
        # Pallas forward (winner export) + fused Pallas backward: the
        # training fast path — no pair-grid rematerialization in HBM.
        # A / b_c arrive pre-padded to the kernel lane width in compute
        # dtype — no separate pad/convert passes over the point grid.
        outs = _pallas_train_pool(statics)(
            A,
            pool_xyz,
            b_c,
            cen_xyz,
            ranks.astype(jnp.float32),
            params.kernels[0],
            params.biases[0],
            *diff_params,
        )[:, :M]
    elif impl == "pallas":
        # Pallas forward with a recompute-XLA backward (custom_vjp): the
        # primal runs the fast kernel, gradients re-derive through the
        # rematerialized XLA scan.
        outs = _hybrid_pool(statics)(
            A,
            pool_xyz,
            b_c,
            cen_xyz,
            ranks.astype(jnp.float32),
            params.kernels[0],
            params.biases[0],
            *diff_params,
        )[:, :M]
    elif impl == "winner":
        # Winner-recompute backward: W/c_out x fewer backward pair FLOPs.
        # MEASURED SLOWER on v5e (train 45 -> 11.8 scenes/sec at batch 32):
        # the (B*M*c_out) random row gathers + scatter-adds cost far more
        # than the FLOPs saved — TPU gathers are row-rate-bound, not
        # locality-bound. Kept as an opt-in (gradient-exact, tested) for
        # hardware where sparse access is cheap; the default training path
        # is the rematerialized scan until the fused Pallas backward lands.
        outs = _winner_pool(statics)(
            A, sxyz, b_c, cen_xyz, ranks.astype(jnp.float32), *diff_params
        )[:, :M]
    else:
        outs = _scan_pool(
            A, sxyz, b_c, cen_xyz, ranks.astype(jnp.float32), *diff_params,
            statics=statics,
        )[:, :M]

    kers = [k.astype(compute_dtype) for k in params.kernels[1:]]
    bias = [b.astype(compute_dtype) for b in params.biases[1:]]
    # The center's own point is always an in-radius neighbor (centers are a
    # subset of the points) but a block-shared window may miss it for rank
    # outliers. Max in the self term explicitly — max is idempotent, so this
    # is exactly pooling over (window neighborhood) U {self}, and guarantees
    # a non-degenerate output like the reference's first-hit fill
    # (ball_query_gpu.cu:38-43).
    # a_self is RECOMPUTED from the gathered raw inputs rather than gathered
    # from A: gathering A would make the backward scatter-add a (B*N, c1)
    # cotangent into dA — measured as the single largest non-Pallas op in
    # the train step (11 ms at SA1, where N = 50k). Recomputing moves the
    # gather to the (B, M, 3+C) INPUT rows, whose cotangent either vanishes
    # (SA1: xyz/colors are leaf data, so XLA drops the scatter entirely) or
    # is no larger than before. Same ops, same dtypes — values match the
    # A-gather formulation to bf16 rounding.
    self_idx = jnp.clip(ranks[:, :M], 0, N - 1)
    # ranks went through lax.sort in every branch above EXCEPT dense without
    # return_rank_order, where ranks = center_idx verbatim (arbitrary FPS
    # order) — promising sortedness there would be an XLA contract violation.
    ranks_sorted = not (dense and not return_rank_order)
    gath = lambda x: jax.vmap(  # noqa: E731
        lambda a, r: a.at[r].get(
            mode="promise_in_bounds", unique_indices=True,
            indices_are_sorted=ranks_sorted,
        )
    )(x, self_idx)
    self_in = gath(pts_in)
    a_self = (
        self_in.astype(compute_dtype) @ w1.astype(compute_dtype)
        + params.biases[0].astype(compute_dtype)
    )
    a_self = _ln(a_self, params.ln_scales[0], params.ln_biases[0]).astype(
        compute_dtype
    )
    # b_c may be lane-padded for the Pallas kernels; the self term runs on
    # the real width (a_self is computed from the unpadded params)
    h_self = jax.nn.relu(a_self + b_c[:, :M, :c1]).astype(compute_dtype)
    for i, (k, b) in enumerate(zip(kers, bias)):
        h_self = h_self @ k + b
        if i + 1 < len(kers):
            h_self = _act_ln(
                h_self, params.ln_scales[i + 1], params.ln_biases[i + 1]
            ).astype(compute_dtype)
    outs = jnp.maximum(outs, h_self.astype(jnp.float32))
    # final norm + activation on the POOLED features: per center (M rows),
    # off the pair grid entirely
    outs = _act_ln(outs, params.ln_scales[-1], params.ln_biases[-1])

    if return_rank_order:
        return outs, ranks[:, :M]
    if not dense:
        # restore center_idx order: outs currently in rank-sorted order
        inv = jnp.argsort(center_order, axis=1)
        outs = jnp.take_along_axis(outs, inv[..., None], axis=1)
    return outs


def fused_sa_reference(
    xyz, features, center_idx, params, *, radius, window, block=64
) -> jnp.ndarray:
    """O(M*N) oracle with identical window/norm-placement semantics.

    Mirrors the production function exactly: per-point pre-LN of the layer-0
    projection, ReLU(LN(a_p) + b_c), interior LN+ReLU layers on pairs, final
    layer pooled pre-activation, LN+ReLU per center.
    """
    import numpy as np

    def _np_ln(h, scale, bias):
        mu = h.mean(-1, keepdims=True)
        var = h.var(-1, keepdims=True)
        return (h - mu) / np.sqrt(var + 1e-5) * np.asarray(scale) + np.asarray(bias)

    xyz = np.asarray(xyz)
    feats = np.asarray(features)
    cidx = np.asarray(center_idx)
    B, N, _ = xyz.shape
    M = cidx.shape[1]

    if window >= N:
        order = np.tile(np.arange(N), (B, 1))
        sorted_xyz, sorted_feats = xyz, feats
    else:
        keys = np.asarray(morton_keys(jnp.asarray(xyz), radius))
        order = np.argsort(keys, axis=1, kind="stable")
        sorted_xyz = np.take_along_axis(xyz, order[..., None], 1)
        sorted_feats = np.take_along_axis(feats, order[..., None], 1)

    out = np.zeros((B, M, params.kernels[-1].shape[1]), np.float32)
    for b in range(B):
        inv = np.argsort(order[b])
        ranks = inv[cidx[b]]
        rank_order = (
            np.arange(M) if window >= N else np.argsort(ranks, kind="stable")
        )
        for blk in range(0, M, block):
            members = rank_order[blk : blk + block]
            if window >= N:
                start = 0
            else:
                mid_pos = min(blk + block // 2, M - 1)
                start = int(
                    np.clip(ranks[rank_order[mid_pos]] - window // 2, 0, max(N - window, 0))
                )
            W = min(window, N)
            xw = sorted_xyz[b, start : start + W]
            fw = sorted_feats[b, start : start + W]
            for m in members:
                c = xyz[b, cidx[b, m]]
                d2 = ((xw - c) ** 2).sum(-1)
                valid = d2 <= radius * radius
                # neighborhood U {self}: the center itself always participates
                pts = np.concatenate(
                    [
                        np.concatenate([xw[valid], c[None]]) / radius,
                        np.concatenate([fw[valid], feats[b, cidx[b, m]][None]]),
                    ],
                    -1,
                )
                k0 = np.asarray(params.kernels[0])
                a_p = _np_ln(
                    pts @ k0 + np.asarray(params.biases[0]),
                    params.ln_scales[0],
                    params.ln_biases[0],
                )
                b_c = -(c / radius) @ k0[:3]
                h = np.maximum(a_p + b_c, 0)
                n_rest = len(params.kernels) - 1
                for i in range(1, n_rest + 1):
                    h = h @ np.asarray(params.kernels[i]) + np.asarray(params.biases[i])
                    if i < n_rest:  # interior: LN+ReLU on pairs
                        h = np.maximum(
                            _np_ln(h, params.ln_scales[i], params.ln_biases[i]), 0
                        )
                pooled = h.max(0)
                out[b, m] = np.maximum(
                    _np_ln(pooled, params.ln_scales[-1], params.ln_biases[-1]), 0
                )
    return jnp.asarray(out)
