"""Fused SA layer-0 prep kernel vs the XLA formulation (interpret mode).

``sa_prep`` collapses concat + matmul + bias + LayerNorm + compute-dtype
cast + the 128-lane xyz pad into one Pallas pass each way; these tests pin
its forward values and every gradient against the exact XLA ops it
replaces (``fused_sa.py``'s padded layer-0 pipeline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eda_tpu.ops import fused_sa as FS
from eda_tpu.ops.pallas import sa_prep as SP
from eda_tpu.ops.pallas.sa_kernel import _ceil_lane, _pad_lanes


def _setup(B=2, N=512, C=4, c1=8, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (B, N, 3 + C)).astype(np.float32)
    w1 = rng.normal(size=(3 + C, c1)).astype(np.float32) * 0.4
    b1 = rng.normal(size=(c1,)).astype(np.float32) * 0.1
    s1 = (1 + 0.1 * rng.normal(size=(c1,))).astype(np.float32)
    l1 = (0.1 * rng.normal(size=(c1,))).astype(np.float32)
    return pts, w1, b1, s1, l1


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_prep_matches_xla_pipeline(dtype):
    radius = 0.4
    pts, w1, b1, s1, l1 = _setup()
    c1 = w1.shape[1]
    c1p = _ceil_lane(c1)

    def xla_path(w1_, b1_, s1_, l1_):
        w1_eff = _pad_lanes(jnp.asarray(w1_), c1p)
        b1_eff = _pad_lanes(jnp.asarray(b1_).reshape(1, -1), c1p)[0]
        s1_eff = _pad_lanes(jnp.asarray(s1_).reshape(1, -1), c1p)[0]
        lb1_eff = _pad_lanes(jnp.asarray(l1_).reshape(1, -1), c1p)[0]
        pts_in = jnp.concatenate([pts[..., :3] / radius, pts[..., 3:]], -1)
        A = pts_in.astype(dtype) @ w1_eff.astype(dtype) + b1_eff.astype(dtype)
        return FS._ln_padded(A, s1_eff, lb1_eff, c_real=c1).astype(dtype)

    def prep_path(w1_, b1_, s1_, l1_):
        w1_eff = _pad_lanes(jnp.asarray(w1_), c1p)
        A, xyzp = SP.sa_prep(
            jnp.asarray(pts), w1_eff,
            _pad_lanes(jnp.asarray(b1_).reshape(1, -1), c1p),
            _pad_lanes(jnp.asarray(s1_).reshape(1, -1), c1p),
            _pad_lanes(jnp.asarray(l1_).reshape(1, -1), c1p),
            c_real=c1, radius=radius, compute_dtype=dtype,
        )
        return A, xyzp

    A_x = np.asarray(xla_path(w1, b1, s1, l1), np.float32)
    A_p, xyzp = prep_path(w1, b1, s1, l1)
    A_p, xyzp = np.asarray(A_p, np.float32), np.asarray(xyzp)
    atol = 0.02 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(A_p, A_x, atol=atol)
    # padding lanes exactly zero (kernel invariant for downstream LN sums)
    assert np.abs(A_p[..., c1:]).max() == 0.0
    # xyz pad output: lanes 0..2 = raw xyz, rest exactly zero
    np.testing.assert_array_equal(xyzp[..., :3], pts[..., :3])
    assert np.abs(xyzp[..., 3:]).max() == 0.0

    G = jnp.asarray(
        np.random.default_rng(1).normal(size=A_x.shape).astype(np.float32)
    ).at[..., c1:].set(0.0)

    gx = jax.grad(
        lambda *p: jnp.sum(xla_path(*p).astype(jnp.float32) * G),
        argnums=(0, 1, 2, 3),
    )(w1, b1, s1, l1)
    gp = jax.grad(
        lambda *p: jnp.sum(prep_path(*p)[0].astype(jnp.float32) * G),
        argnums=(0, 1, 2, 3),
    )(w1, b1, s1, l1)
    rtol = 0.02 if dtype == jnp.bfloat16 else 1e-4
    for name, a, b in zip(("dw1", "db1", "ds1", "dl1"), gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < rtol, (name, rel)

    # dpts (consumed when SA features come from a previous layer)
    def loss_pts_xla(p):
        w1_eff = _pad_lanes(jnp.asarray(w1), c1p)
        b1_eff = _pad_lanes(jnp.asarray(b1).reshape(1, -1), c1p)[0]
        s1_eff = _pad_lanes(jnp.asarray(s1).reshape(1, -1), c1p)[0]
        lb1_eff = _pad_lanes(jnp.asarray(l1).reshape(1, -1), c1p)[0]
        pts_in = jnp.concatenate([p[..., :3] / radius, p[..., 3:]], -1)
        A = pts_in.astype(dtype) @ w1_eff.astype(dtype) + b1_eff.astype(dtype)
        A = FS._ln_padded(A, s1_eff, lb1_eff, c_real=c1).astype(dtype)
        return jnp.sum(A.astype(jnp.float32) * G)

    def loss_pts_prep(p):
        w1_eff = _pad_lanes(jnp.asarray(w1), c1p)
        A, _ = SP.sa_prep(
            p, w1_eff,
            _pad_lanes(jnp.asarray(b1).reshape(1, -1), c1p),
            _pad_lanes(jnp.asarray(s1).reshape(1, -1), c1p),
            _pad_lanes(jnp.asarray(l1).reshape(1, -1), c1p),
            c_real=c1, radius=radius, compute_dtype=dtype,
        )
        return jnp.sum(A.astype(jnp.float32) * G)

    da = np.asarray(jax.grad(loss_pts_xla)(jnp.asarray(pts)))
    db = np.asarray(jax.grad(loss_pts_prep)(jnp.asarray(pts)))
    rel = np.abs(da - db).max() / (np.abs(da).max() + 1e-6)
    assert rel < rtol, ("dpts", rel)


def test_row_block_divisors():
    assert SP._row_block(50000) == 2000
    assert SP._row_block(2048) == 2048
    assert SP._row_block(1024) == 1024
    assert 50000 % SP._row_block(50000) == 0
