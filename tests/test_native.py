"""Native host-pipeline core vs numpy implementations."""

import numpy as np
import pytest

from eda_tpu.data import native
from eda_tpu.data.presort import morton_keys_np

pytestmark = pytest.mark.skipif(
    not native.build(), reason="native toolchain unavailable"
)


def test_morton_argsort_matches_numpy(rng):
    xyz = rng.uniform(-5, 5, (5000, 3)).astype(np.float32)
    got = native.morton_argsort(xyz, 0.2)
    keys = morton_keys_np(xyz, 0.2)
    want = np.argsort(keys, kind="stable")
    # orders must both sort the keys; ties may break differently between
    # radix (stable by construction) and numpy stable sort -> identical.
    np.testing.assert_array_equal(keys[got], keys[want])
    assert (np.diff(keys[got].view(np.uint32).astype(np.uint64)) >= 0).all()


def test_ply_decode_matches_python_reader(tmp_path, rng):
    from eda_tpu.data.ply import read_ply_vertices, write_ply_vertices

    path = str(tmp_path / "v.ply")
    data = {
        "x": rng.normal(size=100).astype(np.float32),
        "y": rng.normal(size=100).astype(np.float32),
        "z": rng.normal(size=100).astype(np.float32),
        "red": rng.integers(0, 255, 100).astype(np.uint8),
    }
    write_ply_vertices(path, data)
    with open(path, "rb") as f:
        raw = f.read()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    layout = [(0, 4, "f"), (4, 4, "f"), (8, 4, "f"), (12, 1, "u")]
    out = native.ply_decode(raw[header_end:], 100, 13, layout)
    np.testing.assert_allclose(out[:, 0], data["x"], rtol=1e-6)
    np.testing.assert_allclose(out[:, 3], data["red"], rtol=1e-6)

    ref = read_ply_vertices(path)
    np.testing.assert_allclose(out[:, 1], ref["y"], rtol=1e-6)


def test_prepare_scene(rng):
    xyz = rng.uniform(-3, 3, (10000, 3)).astype(np.float32)
    out_xyz, src = native.prepare_scene(xyz, 4096, seed=1184)
    assert out_xyz.shape == (4096, 3)
    assert (src >= 0).all() and (src < 10000).all()
    # output points are source points (after identity alignment)
    np.testing.assert_allclose(out_xyz, xyz[src], rtol=1e-6)
    # morton-sorted
    keys = morton_keys_np(out_xyz, 0.2).view(np.uint32).astype(np.uint64)
    assert (np.diff(keys) >= 0).all()
    # deterministic
    out2, src2 = native.prepare_scene(xyz, 4096, seed=1184)
    np.testing.assert_array_equal(src, src2)


def test_prepare_scene_with_alignment(rng):
    xyz = rng.uniform(-3, 3, (1000, 3)).astype(np.float32)
    rot = np.eye(4)
    rot[0, 3] = 5.0  # translation
    out_xyz, src = native.prepare_scene(xyz, 512, seed=7, align=rot.ravel())
    np.testing.assert_allclose(out_xyz[:, 0], xyz[src, 0] + 5.0, rtol=1e-5)


def test_prepare_scene_matches_numpy_randomstate(rng):
    """The native downsample must reproduce the Python packing path's
    np.random.RandomState(seed).choice draw bit-for-bit (MT19937 + legacy
    Fisher-Yates in the C++ core) — both replace=False (n >= keep) and
    replace=True (n < keep) branches."""
    for n, keep, seed in [(3000, 500, 1184), (800, 1000, 1184)]:
        xyz = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        _, src = native.prepare_scene(xyz, keep, seed=seed)
        want = np.random.RandomState(seed).choice(n, keep, replace=n < keep)
        np.testing.assert_array_equal(np.sort(src), np.sort(want))
