"""Spatial sort / ranking utilities tests."""

import numpy as np
import jax.numpy as jnp

from eda_tpu.ops.spatial import cell_keys, center_ranks, sort_by_cell, window_starts


def test_sort_by_cell_orders_keys(rng):
    xyz = jnp.asarray(rng.uniform(-3, 3, (2, 500, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 500, 4)).astype(np.float32))
    scene = sort_by_cell(xyz, feats, cell_size=0.5)
    keys = np.asarray(scene.keys)
    assert (np.diff(keys, axis=1) >= 0).all()
    # payload stayed aligned: keys recomputed from sorted xyz match
    rekeys = np.asarray(cell_keys(scene.xyz, 0.5))
    np.testing.assert_array_equal(keys, rekeys)
    # perm maps back to original points
    orig = np.asarray(xyz)
    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(scene.xyz)[b], orig[b][np.asarray(scene.perm)[b]]
        )


def test_center_ranks_match_searchsorted(rng):
    pts = np.sort(rng.integers(0, 1000, (2, 200)).astype(np.int32), axis=1)
    cens = rng.integers(0, 1000, (2, 16)).astype(np.int32)
    cens = np.sort(cens, axis=1)
    got = np.asarray(center_ranks(jnp.asarray(pts), jnp.asarray(cens)))
    for b in range(2):
        want = np.searchsorted(pts[b], cens[b], side="left")
        np.testing.assert_array_equal(got[b], want)


def test_window_starts_clamped():
    ranks = jnp.asarray(np.array([[0, 100, 995]], np.int32))
    starts = np.asarray(window_starts(ranks, n_points=1000, window=200))
    assert starts[0, 0] == 0
    assert starts[0, 1] == 0  # 100 - 100 = 0
    assert starts[0, 2] == 800  # clamped to N - W
