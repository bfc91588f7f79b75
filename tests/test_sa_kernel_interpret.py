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
        return orig.__wrapped__(*a, **k)  # bypass jit to pass interpret

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
