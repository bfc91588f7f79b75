"""Fused set-abstraction vs its O(M*N) oracle + coverage checks."""

import numpy as np
import jax.numpy as jnp

from eda_tpu.ops.fused_sa import (
    SAParams,
    fused_sa_reference,
    fused_set_abstraction,
    morton_keys,
)


def make_params(rng, c_in, channels):
    kernels, biases, scales, lbiases = [], [], [], []
    prev = 3 + c_in
    for c in channels:
        kernels.append(jnp.asarray(rng.normal(size=(prev, c)).astype(np.float32) * 0.3))
        biases.append(jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1))
        scales.append(jnp.asarray(np.ones(c, np.float32)))
        lbiases.append(jnp.asarray(np.zeros(c, np.float32)))
        prev = c
    return SAParams(tuple(kernels), tuple(biases), tuple(scales), tuple(lbiases))


def test_dense_mode_matches_oracle(rng):
    B, N, M, C = 2, 128, 16, 4
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    cidx = jnp.asarray(
        np.stack([rng.permutation(N)[:M] for _ in range(B)]).astype(np.int32)
    )
    params = make_params(rng, C, (8, 8, 16))
    got = fused_set_abstraction(
        xyz, feats, cidx, params, radius=0.5, window=N, compute_dtype=jnp.float32
    )
    want = fused_sa_reference(xyz, feats, cidx, params, radius=0.5, window=N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_windowed_mode_matches_oracle(rng):
    B, N, M, C = 2, 512, 32, 2
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    cidx = jnp.asarray(
        np.stack([rng.permutation(N)[:M] for _ in range(B)]).astype(np.int32)
    )
    params = make_params(rng, C, (8, 16))
    got = fused_set_abstraction(
        xyz, feats, cidx, params, radius=0.3, window=256, block=8,
        compute_dtype=jnp.float32,
    )
    want = fused_sa_reference(
        xyz, feats, cidx, params, radius=0.3, window=256, block=8
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_center_always_covered(rng):
    """Every center is within its own radius: output is never the zero fill."""
    B, N, M, C = 1, 256, 16, 2
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    cidx = jnp.asarray(rng.permutation(N)[:M][None].astype(np.int32))
    params = make_params(rng, C, (8, 8))
    out = np.asarray(
        fused_set_abstraction(
            xyz, feats, cidx, params, radius=0.2, window=128, block=8,
            compute_dtype=jnp.float32,
        )
    )
    assert (np.abs(out).sum(-1) > 0).all()


def test_morton_locality(rng):
    """Morton windows should cover the large majority of true neighbors."""
    N, M, r, W = 5000, 256, 0.2, 1024
    xyz = rng.uniform(-3.5, 3.5, (N, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(0, 2.5, N)
    keys = np.asarray(morton_keys(jnp.asarray(xyz[None]), r))[0]
    order = np.argsort(keys, kind="stable")
    inv = np.argsort(order)
    centers = rng.permutation(N)[:M]
    covered, total = 0, 0
    for c in centers:
        d2 = ((xyz - xyz[c]) ** 2).sum(-1)
        nbrs = np.where(d2 <= r * r)[0]
        rank = inv[c]
        lo, hi = max(rank - W // 2, 0), min(rank + W // 2, N)
        in_win = (inv[nbrs] >= lo) & (inv[nbrs] < hi)
        covered += in_win.sum()
        total += len(nbrs)
    assert covered / total > 0.85, covered / total


def test_permutation_alignment(rng):
    """Outputs align with center_idx regardless of spatial ordering."""
    B, N, M, C = 1, 512, 16, 2
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    cidx = np.asarray(rng.permutation(N)[:M][None].astype(np.int32))
    params = make_params(rng, C, (8, 8))
    out1 = np.asarray(
        fused_set_abstraction(
            xyz, feats, jnp.asarray(cidx), params, radius=0.4, window=N,
            compute_dtype=jnp.float32,
        )
    )
    perm = rng.permutation(M)
    out2 = np.asarray(
        fused_set_abstraction(
            xyz, feats, jnp.asarray(cidx[:, perm]), params, radius=0.4, window=N,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(out1[:, perm], out2, rtol=1e-4, atol=1e-5)
