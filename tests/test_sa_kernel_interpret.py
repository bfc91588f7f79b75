"""Pallas SA pair kernel vs the XLA scan path, in interpret mode on CPU.

The windowed paths use different block sizes (the kernel re-blocks centers
16-at-a-time), so windows differ; dense mode (window >= N) covers every
point in both paths and is exactly comparable up to bf16 rounding (the
kernel computes pair matmuls in bf16 by design).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eda_tpu.ops.fused_sa import SAParams, fused_set_abstraction, morton_keys
from eda_tpu.ops.pallas import sa_kernel as SK


@pytest.fixture
def interpret_kernel(monkeypatch):
    orig = SK.sa_pair_pool_pallas

    def patched(*a, **k):
        k["interpret"] = True
        return getattr(orig, "__wrapped__", orig)(*a, **k)

    monkeypatch.setattr(SK, "sa_pair_pool_pallas", patched)


def _setup(seed=1, B=2, N=1024, M=128, C=4, widths=(8, 8, 16)):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    order = np.argsort(np.asarray(morton_keys(jnp.asarray(xyz), 0.3)), axis=1)
    xyz = np.take_along_axis(xyz, order[..., None], 1)
    feats = rng.normal(size=(B, N, C)).astype(np.float32)
    kernels, biases, scales, lbias = [], [], [], []
    prev = 3 + C
    for c in widths:
        kernels.append(jnp.asarray(rng.normal(size=(prev, c)).astype(np.float32) * 0.4))
        biases.append(jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1))
        scales.append(jnp.asarray(1 + 0.1 * rng.normal(size=(c,)).astype(np.float32)))
        lbias.append(jnp.asarray(0.1 * rng.normal(size=(c,)).astype(np.float32)))
        prev = c
    params = SAParams(tuple(kernels), tuple(biases), tuple(scales), tuple(lbias))
    cidx = jnp.asarray(np.stack([np.sort(rng.permutation(N)[:M]) for _ in range(B)]))
    return jnp.asarray(xyz), jnp.asarray(feats), cidx, params


def test_pallas_kernel_matches_scan_dense(interpret_kernel):
    xyz, feats, cidx, params = _setup()
    kw = dict(radius=0.3, window=xyz.shape[1], block=64, presorted=True)
    ref = fused_set_abstraction(
        xyz, feats, cidx, params, impl="xla", compute_dtype=jnp.bfloat16, **kw
    )
    out = fused_set_abstraction(
        xyz, feats, cidx, params, impl="pallas", compute_dtype=jnp.bfloat16, **kw
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.03)


def test_d2_mode_resolution(monkeypatch):
    """d2_mode resolves at CALL time: explicit kwarg wins, then the env var,
    then the 'pair' default — no importlib.reload needed to switch."""
    monkeypatch.delenv("EDA_SA_D2", raising=False)
    assert SK._resolve_d2_mode(None) == "pair"
    assert SK._resolve_d2_mode("mxu") == "mxu"
    assert SK._resolve_d2_mode("pre") == "pre"
    monkeypatch.setenv("EDA_SA_D2", "mxu")
    assert SK._resolve_d2_mode(None) == "mxu"
    assert SK._resolve_d2_mode("pair") == "pair"
    monkeypatch.setenv("EDA_SA_D2", "bogus")
    with pytest.raises(ValueError):
        SK._resolve_d2_mode(None)


@pytest.mark.parametrize("d2_mode", ["pair", "mxu", "pre"])
def test_d2_modes_equivalent(d2_mode):
    """Both radius-test strategies compute the same pooled output away from
    the radius boundary. Grid-quantized coordinates keep every pair a safe
    distance from |p-c| == r (the 'mxu' expansion formula is not
    bit-identical to the direct test at exact ties — see sa_kernel.py)."""
    rng = np.random.default_rng(11)
    B, N, M, c1 = 1, 256, 16, 8
    widths = (8, 16)
    # quantize to a 0.05 grid: every pair d2 is a multiple of 0.0025, and
    # r^2 = 0.4113 is not, so all pairs sit >= 0.0012 from the boundary
    xyz = np.sort(
        (rng.integers(-20, 20, (B, N, 3)) * 0.05).astype(np.float32), axis=1
    )
    A = rng.normal(size=(B, N, c1)).astype(np.float32)
    ranks = np.sort(rng.permutation(N)[:M])[None]
    cen = np.take_along_axis(xyz, ranks[..., None], 1)
    b_c = rng.normal(size=(B, M, c1)).astype(np.float32)
    k1 = rng.normal(size=(c1, 16)).astype(np.float32) * 0.4
    b1 = rng.normal(size=(16,)).astype(np.float32) * 0.1
    layer_params = [
        (jnp.zeros((1, 1)), jnp.zeros(c1), jnp.ones(c1), jnp.zeros(c1)),
        (jnp.asarray(k1), jnp.asarray(b1), jnp.ones(16), jnp.zeros(16)),
    ]
    starts = np.zeros((B, M // 8), np.int32)
    out = SK.sa_pair_pool_pallas(
        jnp.asarray(A), jnp.asarray(xyz), jnp.asarray(b_c), jnp.asarray(cen),
        jnp.asarray(starts), layer_params,
        radius=np.sqrt(0.4113), window=N, block=8, wc=128,
        interpret=True, d2_mode=d2_mode,
    )
    # oracle: dense masked-max over all pairs in f64-ish numpy
    h = np.maximum(A[:, None, :, :] + b_c[:, :, None, :], 0.0)
    h = np.asarray(
        jnp.asarray(h, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
    )
    z = h @ k1 + b1  # (B, M, N, 16)
    d2 = ((xyz[:, None, :, :] - cen[:, :, None, :]) ** 2).sum(-1)
    masked = np.where(d2[..., None] <= 0.4113, z, -1e9)
    ref = masked.max(2)
    got = np.asarray(out)
    valid = ref > -1e8
    np.testing.assert_allclose(got[valid], ref[valid], atol=5e-2)
    assert (got[~valid] < -1e8).all()


def test_d2_pre_windowed_bitexact_vs_pair():
    """'pre' (precomputed planar mask, sa_mask.py) must reproduce 'pair'
    BIT-EXACTLY — outputs AND winner ranks — on windowed inputs away from
    the radius boundary (grid-quantized coords, r^2 off the grid; the
    expansion formula can only flip within ~1e-5 of |p-c| == r)."""
    rng = np.random.default_rng(11)
    B, N, M, c1 = 2, 512, 32, 8
    xyz = np.sort(
        (rng.integers(-30, 30, (B, N, 3)) * 0.05).astype(np.float32), axis=1
    )
    A = rng.normal(size=(B, N, c1)).astype(np.float32)
    ranks = np.stack([np.sort(rng.permutation(N)[:M]) for _ in range(B)])
    cen = np.take_along_axis(xyz, ranks[..., None], 1)
    b_c = rng.normal(size=(B, M, c1)).astype(np.float32)
    k1 = rng.normal(size=(c1, 8)).astype(np.float32) * 0.4
    k2 = rng.normal(size=(8, 16)).astype(np.float32) * 0.4
    layer_params = [
        (jnp.zeros((1, 1)), jnp.zeros(c1), jnp.ones(c1), jnp.zeros(c1)),
        (jnp.asarray(k1), jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1),
         jnp.asarray((1 + 0.1 * rng.normal(size=(8,))).astype(np.float32)),
         jnp.asarray((0.1 * rng.normal(size=(8,))).astype(np.float32))),
        (jnp.asarray(k2), jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1),
         jnp.ones(16), jnp.zeros(16)),
    ]
    W = 256
    mids = ranks.reshape(B, M // 16, 16)[:, :, 8]
    starts = np.clip(mids - W // 2, 0, N - W).astype(np.int32)
    outs = {}
    for mode in ("pair", "pre"):
        out, winners = SK.sa_pair_pool_pallas(
            jnp.asarray(A), jnp.asarray(xyz), jnp.asarray(b_c),
            jnp.asarray(cen), jnp.asarray(starts), layer_params,
            radius=float(np.sqrt(0.4113)), window=W, block=16, wc=128,
            interpret=True, with_winners=True, d2_mode=mode,
        )
        outs[mode] = (np.asarray(out), np.asarray(winners))
    np.testing.assert_array_equal(outs["pre"][0], outs["pair"][0])
    np.testing.assert_array_equal(outs["pre"][1], outs["pair"][1])
    # sanity: the mask actually excluded pairs (not an all-ones mask)
    assert (outs["pair"][0] > -1e8).any()
    d2 = ((xyz[:, None, :, :] - cen[:, :, None, :]) ** 2).sum(-1)
    assert (d2 > 0.4113).any()


def test_sa_radius_mask_matches_numpy():
    """The planar mask kernel (sa_mask.sa_radius_mask) reproduces the direct
    |p-c|^2 <= r^2 test on quantized coords, window for window, including
    the start128 re-alignment offsets and out-of-cloud padding lanes."""
    from eda_tpu.ops.pallas.sa_mask import mask_window, sa_radius_mask

    rng = np.random.default_rng(3)
    B, N, block, n_blocks, W = 2, 512, 16, 4, 256
    r2 = 0.4113
    xyz = np.sort(
        (rng.integers(-30, 30, (B, N, 3)) * 0.05).astype(np.float32), axis=1
    )
    cen = (rng.integers(-30, 30, (B, n_blocks * block, 3)) * 0.05).astype(
        np.float32
    )
    # 16-quantized starts, incl. the max (N - W) edge
    starts16 = np.stack([
        rng.integers(0, (N - W) // 16, n_blocks) * 16 for _ in range(B)
    ]).astype(np.int32)
    starts16[0, -1] = N - W
    pen, offs = sa_radius_mask(
        jnp.asarray(xyz), jnp.asarray(cen), jnp.asarray(starts16),
        radius=float(np.sqrt(r2)), window=W, block=block, interpret=True,
    )
    pen, offs = np.asarray(pen), np.asarray(offs)
    wp = mask_window(W)
    assert pen.shape == (B, n_blocks, wp, block)
    for b in range(B):
        for nb in range(n_blocks):
            s128 = (starts16[b, nb] // 128) * 128
            assert offs[b, nb] == starts16[b, nb] - s128
            for w in range(wp):
                p = s128 + w
                want = (
                    ((xyz[b, p] - cen[b, nb * block:(nb + 1) * block]) ** 2)
                    .sum(-1) <= r2
                ).astype(np.float32) if p < N else np.zeros(block, np.float32)
                np.testing.assert_array_equal(pen[b, nb, w], want)


def test_pallas_kernel_winner_export(interpret_kernel):
    """with_winners: the exported global rank per (center, out_channel) must
    reproduce the pooled value when the pair MLP is recomputed at that
    single winner pair — the contract the sparse backward relies on."""
    rng = np.random.default_rng(7)
    B, N, M, c1 = 1, 256, 32, 8
    widths = (8, 8, 16)
    A = rng.normal(size=(B, N, c1)).astype(np.float32)
    xyz = np.sort(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32), axis=1)
    ranks = np.sort(rng.permutation(N)[:M])[None]
    cen = np.take_along_axis(xyz, ranks[..., None], 1)
    b_c = rng.normal(size=(B, M, c1)).astype(np.float32)
    radius = 0.8

    k1 = rng.normal(size=(8, 8)).astype(np.float32) * 0.4
    b1 = rng.normal(size=(8,)).astype(np.float32) * 0.1
    s1 = (1 + 0.1 * rng.normal(size=(8,))).astype(np.float32)
    lb1 = (0.1 * rng.normal(size=(8,))).astype(np.float32)
    k2 = rng.normal(size=(8, 16)).astype(np.float32) * 0.4
    b2 = rng.normal(size=(16,)).astype(np.float32) * 0.1
    layer_params = [
        (jnp.zeros((1, 1)), jnp.zeros(c1), jnp.ones(c1), jnp.zeros(c1)),
        (jnp.asarray(k1), jnp.asarray(b1), jnp.asarray(s1), jnp.asarray(lb1)),
        (jnp.asarray(k2), jnp.asarray(b2), jnp.ones(16), jnp.zeros(16)),
    ]
    starts = np.zeros((B, M // 8), np.int32)  # dense window = N

    out, winners = SK.sa_pair_pool_pallas(
        jnp.asarray(A), jnp.asarray(xyz), jnp.asarray(b_c), jnp.asarray(cen),
        jnp.asarray(starts), layer_params,
        radius=radius, window=N, block=8, wc=128,
        interpret=True, with_winners=True,
    )
    out, winners = np.asarray(out), np.asarray(winners)

    def mlp_at(b, m, p):
        h = np.maximum(A[b, p].astype(np.float32) + b_c[b, m], 0).astype(
            np.float32
        )
        h = h @ k1 + b1
        mu = h.mean()
        var = ((h - mu) ** 2).mean()
        h = np.maximum((h - mu) / np.sqrt(var + 1e-5) * s1 + lb1, 0)
        return h @ k2 + b2  # (16,) pre-activation

    checked = 0
    for m in range(M):
        if out[0, m, 0] < -1e8:
            continue  # no in-radius point; winner undefined
        for c in range(0, 16, 5):
            p = int(winners[0, m, c])
            d2 = ((xyz[0, p] - cen[0, m]) ** 2).sum()
            assert d2 <= radius * radius + 1e-6  # winner is in radius
            val = mlp_at(0, m, p)[c]
            np.testing.assert_allclose(out[0, m, c], val, atol=0.05)
            checked += 1
    assert checked > 20


def test_pallas_kernel_windowed_finite_and_close(interpret_kernel):
    """Windowed kernel: outputs finite, and close to the scan for most
    centers (windows differ only for blocks straddling Morton jumps)."""
    xyz, feats, cidx, params = _setup(seed=2)
    kw = dict(radius=0.3, window=512, block=64, presorted=True)
    ref = fused_set_abstraction(
        xyz, feats, cidx, params, impl="xla", compute_dtype=jnp.bfloat16, **kw
    )
    out = fused_set_abstraction(
        xyz, feats, cidx, params, impl="pallas", compute_dtype=jnp.bfloat16, **kw
    )
    assert np.isfinite(np.asarray(out)).all()
    per_center = np.abs(np.asarray(out) - np.asarray(ref)).max(-1)
    close = (per_center < 0.03).mean()
    assert close > 0.7, f"only {close:.2%} of centers match the scan"


@pytest.fixture
def interpret_bwd(monkeypatch):
    for name in ("sa_pair_pool_pallas", "sa_pair_pool_bwd_pallas"):
        orig = getattr(SK, name)

        def patched(*a, _orig=orig, **k):
            k["interpret"] = True
            return getattr(_orig, "__wrapped__", _orig)(*a, **k)

        monkeypatch.setattr(SK, name, patched)


@pytest.mark.parametrize("compact", [False, True])
def test_pallas_backward_matches_winner_routed_gradient(
    interpret_bwd, monkeypatch, compact
):
    """The fused Pallas backward must equal the analytic gradient of the
    pooled pre-activations with winners pinned: route each (center, channel)
    cotangent to its winning pair, backprop the pair MLP at that single pair.
    Covers windows, multiple blocks, multiple batch rows (RMW overlap), and
    the masked interior LayerNorm — checked against an explicit numpy
    per-slot accumulation with each kernel's exact bf16 rounding points:
    the windowed kernel backpropagates each pair row once with its grouped
    multi-channel cotangent and folds dA in exact f32; the winner-compact
    kernel backpropagates one row per (center, channel) and rounds dh0 to
    bf16 before the dA selection-matmul scatter."""
    from eda_tpu.ops import fused_sa as FS

    monkeypatch.setattr(FS, "_COMPACT_BWD", compact)

    rng = np.random.default_rng(5)
    B, N, M, W, c1 = 2, 512, 32, 256, 8
    radius = 0.6
    A = jnp.asarray(rng.normal(size=(B, N, c1)).astype(np.float32))
    xyz = jnp.asarray(
        np.sort(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32), axis=1)
    )
    ranks = np.stack(
        [np.sort(rng.permutation(N)[:M]) for _ in range(B)]
    ).astype(np.int32)
    cen = jnp.take_along_axis(xyz, jnp.asarray(ranks)[..., None], 1)
    b_c = jnp.asarray(rng.normal(size=(B, M, c1)).astype(np.float32))
    kernels = (
        jnp.asarray(rng.normal(size=(c1, 8)).astype(np.float32) * 0.4),
        jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32) * 0.4),
    )
    biases = (
        jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1),
    )
    scales = (jnp.asarray(1 + 0.1 * rng.normal(size=(8,)).astype(np.float32)),)
    lbiases = (jnp.asarray(0.1 * rng.normal(size=(8,)).astype(np.float32)),)
    statics = (radius, W, 16, M // 16, False, jnp.bfloat16)
    pool = FS._pallas_train_pool(statics)
    k0 = jnp.zeros((1, 1), jnp.float32)
    b0 = jnp.zeros((c1,), jnp.float32)
    ranks_f = jnp.asarray(ranks).astype(jnp.float32)
    out = pool(A, xyz, b_c, cen, ranks_f, k0, b0, kernels, biases, scales, lbiases)
    G = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    G = jnp.where(out < -1e8, 0.0, G)  # the outer self-term max routes these away

    def loss(A_, bc_, ks, bs, ss, ls):
        return jnp.sum(
            pool(A_, xyz, bc_, cen, ranks_f, k0, b0, ks, bs, ss, ls) * G
        )

    dA_k, dbc_k, dk_k, db_k, ds_k, dlb_k = jax.grad(
        loss, argnums=(0, 1, 2, 3, 4, 5)
    )(A, b_c, kernels, biases, scales, lbiases)

    _, winners = SK.sa_pair_pool_pallas(
        A, xyz, b_c, cen, FS._pallas_starts(ranks_f, statics, N)[0],
        [(k0, b0, jnp.ones(c1), jnp.zeros(c1)),
         (kernels[0], biases[0], scales[0], lbiases[0]),
         (kernels[1], biases[1], jnp.ones(16), jnp.zeros(16))],
        radius=radius, window=W, block=16, wc=128, with_winners=True,
    )
    wn, out_np, G_np = np.asarray(winners), np.asarray(out), np.asarray(G)

    def bf(x):
        return np.asarray(
            jnp.asarray(x, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
        )

    A_eff, bc_eff = bf(A), bf(b_c)
    k1, k2 = bf(kernels[0]), bf(kernels[1])
    b1, b2 = np.asarray(biases[0]), np.asarray(biases[1])
    s1, l1 = np.asarray(scales[0]), np.asarray(lbiases[0])
    dA_np = np.zeros((B, N, c1), np.float64)
    dbc_np = np.zeros((B, M, c1), np.float64)
    dk1_np = np.zeros_like(k1, dtype=np.float64)
    dk2_np = np.zeros_like(k2, dtype=np.float64)
    db1_np = np.zeros(8, np.float64)
    db2_np = np.zeros(16, np.float64)
    ds1_np = np.zeros(8, np.float64)
    dl1_np = np.zeros(8, np.float64)
    if compact:
        # one cotangent route per (center, channel) winner slot
        routes = [
            (b, m, int(wn[b, m, c]),
             np.where(np.arange(16) == c, G_np[b, m], 0.0))
            for b in range(B) for m in range(M) for c in range(16)
            if out_np[b, m, c] > -1e8 and G_np[b, m, c] != 0.0
        ]
    else:
        # group channels by winning row — the windowed kernel backpropagates
        # each pair row ONCE with its full multi-channel cotangent, and bf16
        # rounding does not commute with the channel sum
        routes = []
        for b in range(B):
            for m in range(M):
                for p in np.unique(wn[b, m]):
                    d2v = np.where(
                        (wn[b, m] == p) & (out_np[b, m] > -1e8),
                        G_np[b, m], 0.0,
                    )
                    if d2v.any():
                        routes.append((b, m, int(p), d2v))
    if True:
        if True:
            for b, m, p, d2v in routes:
                h0_pre = A_eff[b, p] + bc_eff[b, m]
                h0 = bf(np.maximum(h0_pre, 0))
                x = h0 @ k1 + b1
                mu = x.mean()
                rstd = 1.0 / np.sqrt(((x - mu) ** 2).mean() + 1e-5)
                xhat = (x - mu) * rstd
                h1 = bf(np.maximum(xhat * s1 + l1, 0))
                d2bf = bf(d2v)  # the kernel rounds cotangents to bf16 for MXU
                dk2_np += np.outer(h1, d2bf)
                db2_np += d2v
                dh1 = k2 @ d2bf
                dln = dh1 * (h1 > 0)
                ds1_np += dln * xhat
                dl1_np += dln
                dxhat = dln * s1
                dx = rstd * (dxhat - dxhat.mean() - xhat * (dxhat * xhat).mean())
                dxbf = bf(dx)
                dk1_np += np.outer(h0, dxbf)
                db1_np += dx
                dh0 = (k1 @ dxbf) * (h0_pre > 0)
                # the compact kernel rounds dh0 to bf16 before the selection
                # -matmul scatter; the windowed fold adds exact f32
                dA_np[b, p] += bf(dh0) if compact else dh0
                dbc_np[b, m] += dh0

    # dbc folds are exact f32 in both kernels; weight grads round the
    # cotangent to bf16 before the MXU -> small tolerance there.
    np.testing.assert_allclose(np.asarray(dA_k), dA_np, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dbc_k), dbc_np, atol=1e-4)
    for got, want in [
        (dk_k[0], dk1_np), (dk_k[1], dk2_np), (db_k[0], db1_np),
        (db_k[1], db2_np), (ds_k[0], ds1_np), (dlb_k[0], dl1_np),
    ]:
        denom = np.abs(want).max() + 1e-6
        assert np.abs(np.asarray(got) - want).max() / denom < 0.01


def test_pallas_train_impl_full_integration(interpret_bwd):
    """impl='pallas_train' through fused_set_abstraction: dense-mode grads
    must track the XLA scan's (identical windows; bf16 forward differences
    can swap near-tied winners, so compare with tolerance)."""
    xyz, feats, cidx, params = _setup(seed=4, N=512, M=64)
    kw = dict(radius=0.3, window=xyz.shape[1], block=64, presorted=True)
    G = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 16)).astype(np.float32)
    )

    def loss(p, impl):
        out = fused_set_abstraction(
            xyz, feats, cidx, p, impl=impl, compute_dtype=jnp.bfloat16, **kw
        )
        return jnp.sum(out * G)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_new = jax.grad(lambda p: loss(p, "pallas_train"))(params)
    for name in ("kernels", "biases", "ln_scales", "ln_biases"):
        for a, b in zip(getattr(g_ref, name), getattr(g_new, name)):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(a).max() + 1e-6
            assert np.abs(a - b).max() / denom < 0.15


def test_pallas_train_impl_block8(interpret_bwd):
    """pb=8 path (m_total % 16 != 0): the batched accumulator updates, dA
    tree fold, and winner folds must hold at the small block size too —
    gradients track the XLA scan. Dense windows: the pallas path quantizes
    window starts to 128-multiples while the scan does not, so windowed
    layers pool (slightly) different pair sets and only dense mode admits
    an exact cross-implementation comparison."""
    xyz, feats, cidx, params = _setup(seed=7, N=512, M=56)
    kw = dict(radius=0.4, window=xyz.shape[1], block=8, presorted=True)
    G = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 56, 16)).astype(np.float32)
    )

    def loss(p, impl):
        out = fused_set_abstraction(
            xyz, feats, cidx, p, impl=impl, compute_dtype=jnp.bfloat16, **kw
        )
        return jnp.sum(out * G)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    g_new = jax.grad(lambda p: loss(p, "pallas_train"))(params)
    for name in ("kernels", "biases", "ln_scales", "ln_biases"):
        for a, b in zip(getattr(g_ref, name), getattr(g_new, name)):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(a).max() + 1e-6
            assert np.abs(a - b).max() / denom < 0.15, name
