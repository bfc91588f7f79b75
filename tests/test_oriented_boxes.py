"""Oriented-box IoU tests vs analytic cases."""

import numpy as np
import pytest

from eda_tpu.ops.oriented_boxes import box3d_iou, get_3d_box, polygon_area, polygon_clip


def test_identical_boxes():
    c = get_3d_box((2, 1, 1), 0.3, (0, 0, 0))
    iou, iou2d = box3d_iou(c, c)
    assert iou == pytest.approx(1.0, abs=1e-5)
    assert iou2d == pytest.approx(1.0, abs=1e-5)


def test_axis_aligned_matches_analytic():
    a = get_3d_box((2, 2, 2), 0.0, (0, 0, 0))
    b = get_3d_box((2, 2, 2), 0.0, (1, 0, 0))
    iou, iou2d = box3d_iou(a, b)
    # overlap 1x2x2 = 4; union 16-4=12
    assert iou == pytest.approx(4 / 12, abs=1e-4)
    assert iou2d == pytest.approx(2 / 6, abs=1e-4)


def test_rotated_45_overlap():
    a = get_3d_box((2, 2, 2), 0.0, (0, 0, 0))
    b = get_3d_box((2, 2, 2), np.pi / 4, (0, 0, 0))
    iou, iou2d = box3d_iou(a, b)
    # square vs rotated square: intersection is a regular octagon
    inter = 8 * (np.sqrt(2) - 1)
    want = inter / (4 + 4 - inter)
    assert iou2d == pytest.approx(want, abs=1e-3)
    assert iou == pytest.approx(want, abs=1e-3)  # same height


def test_disjoint():
    a = get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
    b = get_3d_box((1, 1, 1), 0.5, (10, 0, 0))
    iou, iou2d = box3d_iou(a, b)
    assert iou == 0.0 and iou2d == 0.0


def test_polygon_area_square():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1.0]])
    assert polygon_area(sq) == pytest.approx(1.0)
