"""Point-op tests against O(N^2) numpy oracles (SURVEY.md §4 test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from eda_tpu.ops import pointops as P


def np_fps(xyz, npoint):
    """Literal numpy port of the FPS semantics in sampling_gpu.cu:75-134."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        mindist = np.full(N, 1e10)
        valid = (xyz[b] ** 2).sum(-1) > 1e-3
        last = 0
        for i in range(1, npoint):
            d = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
            mindist = np.minimum(mindist, d)
            score = np.where(valid, mindist, -1.0)
            last = int(np.argmax(score))
            out[b, i] = last
    return out


def np_ball_query(xyz, new_xyz, radius, nsample):
    """Literal numpy port of ball_query_gpu.cu:14-49."""
    B, M, _ = new_xyz.shape
    out = np.zeros((B, M, nsample), np.int32)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(xyz.shape[1]):
                d2 = ((new_xyz[b, m] - xyz[b, k]) ** 2).sum()
                if d2 < radius * radius:
                    if cnt == 0:
                        out[b, m, :] = k
                    out[b, m, cnt] = k
                    cnt += 1
                    if cnt == nsample:
                        break
    return out


def test_fps_matches_reference_semantics(rng):
    xyz = rng.uniform(-1, 1, size=(2, 64, 3)).astype(np.float32)
    got = np.asarray(P.furthest_point_sample(jnp.asarray(xyz), 16))
    want = np_fps(xyz, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_skips_padding_points(rng):
    xyz = rng.uniform(0.5, 1.0, size=(1, 32, 3)).astype(np.float32)
    xyz[0, 10:20] = 0.0  # padding points at origin
    got = np.asarray(P.furthest_point_sample(jnp.asarray(xyz), 12))
    assert not np.isin(got, np.arange(10, 20)).any()


def test_fps_spreads_points():
    # On a uniform grid, FPS min pairwise distance should be >> random choice.
    g = np.stack(np.meshgrid(*[np.linspace(0.1, 1, 8)] * 3), -1).reshape(1, -1, 3)
    idx = np.asarray(P.furthest_point_sample(jnp.asarray(g.astype(np.float32)), 32))[0]
    pts = g[0, idx]
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() > 0.2


def test_gather_and_group(rng):
    pts = rng.normal(size=(2, 20, 5)).astype(np.float32)
    idx = rng.integers(0, 20, size=(2, 7)).astype(np.int32)
    got = np.asarray(P.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b, idx[b]])

    gidx = rng.integers(0, 20, size=(2, 7, 4)).astype(np.int32)
    got = np.asarray(P.group_points(jnp.asarray(pts), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b, gidx[b]])


def test_gather_gradients_scatter_correctly(rng):
    """Autodiff of gather == the reference's atomicAdd scatter backward."""
    pts = jnp.asarray(rng.normal(size=(1, 10, 3)).astype(np.float32))
    idx = jnp.asarray(np.array([[0, 0, 5]], np.int32))  # duplicate index 0

    def f(p):
        return jnp.sum(P.gather_points(p, idx) * 2.0)

    g = np.asarray(jax.grad(f)(pts))[0]
    assert g[0].sum() == 4.0 * 3  # two contributions of 2.0 per channel
    assert g[5].sum() == 2.0 * 3
    assert g[1].sum() == 0.0


def test_ball_query_exact_matches_cuda_semantics(rng):
    xyz = rng.uniform(-1, 1, size=(2, 50, 3)).astype(np.float32)
    new_xyz = xyz[:, :8]
    got = np.asarray(P.ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.5, 6))
    want = np_ball_query(xyz, new_xyz, 0.5, 6)
    np.testing.assert_array_equal(got, want)


def test_ball_query_nearest_all_within_radius(rng):
    xyz = rng.uniform(-1, 1, size=(2, 100, 3)).astype(np.float32)
    new_xyz = xyz[:, :16]
    radius, ns = 0.6, 8
    idx = np.asarray(P.ball_query_nearest(jnp.asarray(xyz), jnp.asarray(new_xyz), radius, ns))
    for b in range(2):
        for m in range(16):
            d2 = ((xyz[b, idx[b, m]] - new_xyz[b, m]) ** 2).sum(-1)
            in_radius = ((xyz[b] - new_xyz[b, m]) ** 2).sum(-1) < radius**2
            n_hits = int(in_radius.sum())
            if n_hits >= ns:
                # must be exactly the ns nearest in-radius points
                want = np.sort(np.sort(((xyz[b] - new_xyz[b, m]) ** 2).sum(-1))[:ns])
                np.testing.assert_allclose(np.sort(d2), want, rtol=1e-4)
            else:
                assert (d2 < radius**2).all()


def test_ball_query_nearest_chunked_matches_unchunked(rng):
    xyz = rng.uniform(-1, 1, size=(1, 300, 3)).astype(np.float32)
    new_xyz = xyz[:, :10]
    a = np.asarray(P.ball_query_nearest(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.5, 8, chunk=1024))
    b = np.asarray(P.ball_query_nearest(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.5, 8, chunk=64))
    # same distance multiset (order/ties may differ)
    for m in range(10):
        da = np.sort(((xyz[0, a[0, m]] - new_xyz[0, m]) ** 2).sum(-1))
        db = np.sort(((xyz[0, b[0, m]] - new_xyz[0, m]) ** 2).sum(-1))
        np.testing.assert_allclose(da, db, rtol=1e-4)


def test_three_nn_matches_bruteforce(rng):
    unknown = rng.normal(size=(2, 30, 3)).astype(np.float32)
    known = rng.normal(size=(2, 12, 3)).astype(np.float32)
    d2, idx = P.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d2, idx = np.asarray(d2), np.asarray(idx)
    for b in range(2):
        full = ((unknown[b][:, None] - known[b][None]) ** 2).sum(-1)
        order = np.argsort(full, axis=-1)[:, :3]
        np.testing.assert_allclose(np.sort(d2[b], -1), np.sort(np.take_along_axis(full, order, -1), -1), rtol=1e-4, atol=1e-5)
        # distances ascending
        assert (np.diff(d2[b], axis=-1) >= -1e-6).all()


def test_three_nn_tie_takes_first_index():
    """Exact-duplicate source points: the iterative argmin keeps the LOWEST
    index among ties, like the CUDA insertion sort's strict < comparisons
    (interpolate_gpu.cu:34-57)."""
    unknown = jnp.zeros((1, 1, 3), jnp.float32)
    # known[1] == known[3] (both distance 0), known[0] and known[2] further
    known = jnp.asarray(
        [[[1.0, 0, 0], [0, 0, 0], [2.0, 0, 0], [0, 0, 0], [3.0, 0, 0]]],
        jnp.float32,
    )
    d2, idx = P.three_nn(unknown, known)
    assert idx[0, 0].tolist() == [1, 3, 0]
    np.testing.assert_allclose(np.asarray(d2[0, 0]), [0.0, 0.0, 1.0])


def test_three_interpolate(rng):
    feats = rng.normal(size=(1, 5, 4)).astype(np.float32)
    idx = np.array([[[0, 1, 2], [3, 4, 0]]], np.int32)
    w = np.array([[[0.5, 0.3, 0.2], [1.0, 0.0, 0.0]]], np.float32)
    got = np.asarray(P.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    want0 = 0.5 * feats[0, 0] + 0.3 * feats[0, 1] + 0.2 * feats[0, 2]
    np.testing.assert_allclose(got[0, 0], want0, rtol=1e-5)
    np.testing.assert_allclose(got[0, 1], feats[0, 3], rtol=1e-5)


def test_interpolation_weights_sum_to_one(rng):
    d2 = jnp.asarray(rng.uniform(0, 2, size=(2, 6, 3)).astype(np.float32))
    w = np.asarray(P.interpolation_weights(d2))
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    # nearest neighbor gets the largest weight
    assert (np.argmax(w, -1) == np.argmin(np.asarray(d2), -1)).all()
