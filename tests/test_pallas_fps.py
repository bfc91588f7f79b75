"""Pallas FPS kernel vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from eda_tpu.ops.pallas.fps import furthest_point_sample_pallas
from eda_tpu.ops.pointops import furthest_point_sample


def test_pallas_fps_matches_jnp(rng):
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(3, 256, 3)).astype(np.float32))
    got = np.asarray(furthest_point_sample_pallas(xyz, 32, interpret=True))
    want = np.asarray(furthest_point_sample(xyz, 32))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_row_block_padding(rng):
    # B=1 forces sublane padding; padded rows must not disturb row 0.
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(1, 200, 3)).astype(np.float32))
    got = np.asarray(furthest_point_sample_pallas(xyz, 32, interpret=True))
    want = np.asarray(furthest_point_sample(xyz, 32))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_skips_padding_points(rng):
    xyz = rng.uniform(0.5, 1.0, size=(2, 150, 3)).astype(np.float32)
    xyz[:, 50:100] = 0.0
    got = np.asarray(furthest_point_sample_pallas(jnp.asarray(xyz), 40, interpret=True))
    assert not np.isin(got, np.arange(50, 100)).any()
