"""Box geometry tests against brute-force numpy oracles."""

import numpy as np
import jax.numpy as jnp

from eda_tpu.ops import boxes as B


def random_boxes(rng, n):
    center = rng.uniform(-2, 2, size=(n, 3))
    extent = rng.uniform(0.1, 1.5, size=(n, 3))
    return np.concatenate([center, extent], axis=-1).astype(np.float32)


def np_iou(a, b):
    """Brute-force IoU of two xyzxyz boxes."""
    lo = np.maximum(a[:3], b[:3])
    hi = np.minimum(a[3:], b[3:])
    whd = np.maximum(hi - lo, 0)
    inter = whd.prod()
    va = np.prod(a[3:] - a[:3])
    vb = np.prod(b[3:] - b[:3])
    return inter / (va + vb - inter)


def test_conversion_roundtrip(rng):
    cxyzwhd = random_boxes(rng, 16)
    corners = np.asarray(B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(cxyzwhd)))
    np.testing.assert_allclose(corners[:, :3] + corners[:, 3:], 2 * cxyzwhd[:, :3], atol=1e-5)
    np.testing.assert_allclose(corners[:, 3:] - corners[:, :3], cxyzwhd[:, 3:], atol=1e-5)


def test_conversion_clamps_degenerate():
    box = jnp.array([[0.0, 0.0, 0.0, 0.0, -1.0, 1.0]])
    out = np.asarray(B.box_cxcyczwhd_to_xyzxyz(box))
    assert (out[:, 3:] >= out[:, :3]).all()


def test_pairwise_iou_matches_bruteforce(rng):
    a = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 8)))
    b = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 5)))
    iou, _ = B.pairwise_box_iou_3d(a, b)
    iou = np.asarray(iou)
    an, bn = np.asarray(a), np.asarray(b)
    for i in range(8):
        for j in range(5):
            np.testing.assert_allclose(iou[i, j], np_iou(an[i], bn[j]), atol=1e-5)


def test_identical_boxes_have_iou_one(rng):
    a = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 4)))
    iou, _ = B.pairwise_box_iou_3d(a, a)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), 1.0, atol=1e-5)


def test_giou_bounds_and_reduction(rng):
    a = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 12)))
    b = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 7)))
    giou = np.asarray(B.generalized_box_iou_3d(a, b))
    iou, _ = B.pairwise_box_iou_3d(a, b)
    assert (giou <= np.asarray(iou) + 1e-6).all()
    assert (giou >= -1 - 1e-6).all()
    # GIoU of a box with itself is 1
    gd = np.diag(np.asarray(B.generalized_box_iou_3d(a, a)))
    np.testing.assert_allclose(gd, 1.0, atol=1e-5)


def test_disjoint_boxes():
    a = jnp.array([[0, 0, 0, 1, 1, 1.0]])
    b = jnp.array([[10, 10, 10, 11, 11, 11.0]])
    iou, _ = B.pairwise_box_iou_3d(a, b)
    assert float(iou[0, 0]) == 0.0
    assert float(B.generalized_box_iou_3d(a, b)[0, 0]) < 0.0


def test_batched_leading_dims(rng):
    a = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 24).reshape(2, 3, 4, 6)))
    b = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 30).reshape(2, 3, 5, 6)))
    iou, _ = B.pairwise_box_iou_3d(a, b)
    assert iou.shape == (2, 3, 4, 5)


def test_elementwise_iou_matches_pairwise_diag(rng):
    a = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 6)))
    b = B.box_cxcyczwhd_to_xyzxyz(jnp.asarray(random_boxes(rng, 6)))
    pair, _ = B.pairwise_box_iou_3d(a, b)
    elem = B.box_iou_3d(a, b)
    np.testing.assert_allclose(np.diag(np.asarray(pair)), np.asarray(elem), atol=1e-6)


def test_corners(rng):
    boxes = jnp.asarray(random_boxes(rng, 3))
    corners = np.asarray(B.box_center_to_corner(boxes))
    assert corners.shape == (3, 8, 3)
    np.testing.assert_allclose(corners.min(1), np.asarray(boxes)[:, :3] - 0.5 * np.asarray(boxes)[:, 3:], atol=1e-5)
    np.testing.assert_allclose(corners.max(1), np.asarray(boxes)[:, :3] + 0.5 * np.asarray(boxes)[:, 3:], atol=1e-5)
