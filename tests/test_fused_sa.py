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


def test_winner_backward_matches_scan_gradients(rng):
    """The winner-recompute custom_vjp (c_out < window) must reproduce the
    rematerialized scan's gradients exactly: the masked max routes each
    out-channel's cotangent through one winning pair, and recomputing the
    pair MLP only at winners is the same chain rule restricted to them."""
    import jax

    from eda_tpu.ops import fused_sa

    B, N, M, C = 2, 256, 24, 2
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    cidx = jnp.asarray(
        np.stack([rng.permutation(N)[:M] for _ in range(B)]).astype(np.int32)
    )
    # channels (8, 8, 16): c_out=16 < window=64 -> winner path active
    params = make_params(rng, C, (8, 8, 16))
    weights = jnp.asarray(rng.normal(size=(B, M, 16)).astype(np.float32))

    def loss(params, impl):
        out = fused_set_abstraction(
            xyz, feats, cidx, params, radius=0.4, window=64, block=8,
            compute_dtype=jnp.float32, impl=impl,
        )
        return jnp.sum(out * weights)

    g_win = jax.grad(lambda p: loss(p, "winner"))(params)
    g_scan = jax.grad(lambda p: loss(p, "xla"))(params)

    for a, b in zip(
        jax.tree_util.tree_leaves(g_win), jax.tree_util.tree_leaves(g_scan)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


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


def test_stride_presample_fps_coverage(rng):
    """Two-stage (Morton-stride + FPS) sampling matches direct FPS spread."""
    import jax
    from eda_tpu.data.presort import morton_sort
    from eda_tpu.models.pointnet2 import FusedSetAbstraction

    N, M = 4096, 128
    xyz_np = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    xyz_np, = morton_sort(xyz_np)
    xyz = jnp.asarray(xyz_np[None])
    feats = jnp.asarray(rng.normal(size=(1, N, 2)).astype(np.float32))

    layer = FusedSetAbstraction(
        npoint=M, radius=0.5, window=N, mlp_channels=(8, 8),
        presorted=True, fps_presample=1024,
    )
    variables = layer.init(jax.random.key(0), xyz, feats, train=False)
    _, _, inds = layer.apply(variables, xyz, feats, train=False)
    inds = np.asarray(inds)[0]
    assert len(set(inds.tolist())) == M  # distinct samples

    pts = xyz_np[inds]
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    np.fill_diagonal(d, 1e9)
    min_spread_two_stage = d.min()

    from eda_tpu.ops.pointops import furthest_point_sample, gather_points

    direct = np.asarray(furthest_point_sample(xyz, M))[0]
    pts_d = xyz_np[direct]
    dd = np.linalg.norm(pts_d[:, None] - pts_d[None], axis=-1)
    np.fill_diagonal(dd, 1e9)
    # two-stage spread within 40% of exact FPS spread
    assert min_spread_two_stage > 0.6 * dd.min(), (min_spread_two_stage, dd.min())
