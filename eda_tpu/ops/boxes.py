"""Axis-aligned 3D box geometry, fully vectorized for XLA.

Boxes come in two parameterizations:

* ``cxcyczwhd`` — center (cx, cy, cz) and extents (w, h, d). This is the
  network's native output format (reference: ``models/losses.py:33-43``).
* ``xyzxyz`` — min corner followed by max corner. All IoU math happens here.

Everything is shape-polymorphic over leading batch dimensions and uses only
element-wise ops and broadcasting, so it fuses cleanly inside larger jitted
graphs on TPU. Unlike the reference (which asserts on degenerate boxes at
runtime, ``models/losses.py:38-40,87-88``), degenerate extents are clamped —
runtime asserts do not exist under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

_MIN_EXTENT = 1e-6


def box_cxcyczwhd_to_xyzxyz(boxes: jnp.ndarray) -> jnp.ndarray:
    """Convert center/extent boxes to min/max-corner boxes.

    Mirrors ``box_cxcyczwhd_to_xyzxyz`` (reference ``models/losses.py:33-43``),
    including the 1e-6 minimum-extent clamp that protects IoU from degenerate
    (zero-volume padding) boxes.

    Args:
        boxes: (..., 6) array [cx, cy, cz, w, h, d].

    Returns:
        (..., 6) array [x0, y0, z0, x1, y1, z1].
    """
    center = boxes[..., 0:3]
    extent = jnp.maximum(boxes[..., 3:6], _MIN_EXTENT)
    return jnp.concatenate([center - 0.5 * extent, center + 0.5 * extent], axis=-1)


def box_volume(boxes: jnp.ndarray) -> jnp.ndarray:
    """Volume of xyzxyz boxes. (..., 6) -> (...)."""
    extent = boxes[..., 3:6] - boxes[..., 0:3]
    return extent[..., 0] * extent[..., 1] * extent[..., 2]


def _pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection volume of xyzxyz boxes: (..., N, 6), (..., M, 6) -> (..., N, M)."""
    lo = jnp.maximum(boxes1[..., :, None, 0:3], boxes2[..., None, :, 0:3])
    hi = jnp.minimum(boxes1[..., :, None, 3:6], boxes2[..., None, :, 3:6])
    whd = jnp.maximum(hi - lo, 0.0)
    return whd[..., 0] * whd[..., 1] * whd[..., 2]


def pairwise_box_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyzxyz boxes.

    Mirrors ``_iou3d_par`` (reference ``models/losses.py:68-73``) but supports
    arbitrary leading batch dims so it can run batched under vmap/jit.

    Args:
        boxes1: (..., N, 6) xyzxyz.
        boxes2: (..., M, 6) xyzxyz.

    Returns:
        (iou, union): two (..., N, M) arrays.
    """
    inter = _pairwise_intersection(boxes1, boxes2)
    vol1 = box_volume(boxes1)
    vol2 = box_volume(boxes2)
    union = vol1[..., :, None] + vol2[..., None, :] - inter
    return inter / jnp.maximum(union, _MIN_EXTENT), union


def generalized_box_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise generalized IoU (GIoU) of xyzxyz boxes.

    GIoU = IoU - (hull - union) / hull, with the enclosing axis-aligned hull.
    Mirrors ``generalized_box_iou3d`` (reference ``models/losses.py:76-97``).

    Args:
        boxes1: (..., N, 6); boxes2: (..., M, 6).

    Returns:
        (..., N, M) GIoU in [-1, 1].
    """
    iou, union = pairwise_box_iou_3d(boxes1, boxes2)
    lo = jnp.minimum(boxes1[..., :, None, 0:3], boxes2[..., None, :, 0:3])
    hi = jnp.maximum(boxes1[..., :, None, 3:6], boxes2[..., None, :, 3:6])
    whd = jnp.maximum(hi - lo, 0.0)
    hull = whd[..., 0] * whd[..., 1] * whd[..., 2]
    return iou - (hull - union) / jnp.maximum(hull, _MIN_EXTENT)


def box_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned xyzxyz box arrays: (..., 6), (..., 6) -> (...)."""
    lo = jnp.maximum(boxes1[..., 0:3], boxes2[..., 0:3])
    hi = jnp.minimum(boxes1[..., 3:6], boxes2[..., 3:6])
    whd = jnp.maximum(hi - lo, 0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    union = box_volume(boxes1) + box_volume(boxes2) - inter
    return inter / jnp.maximum(union, _MIN_EXTENT)


def box_center_to_corner(boxes: jnp.ndarray) -> jnp.ndarray:
    """Eight corner points of cxcyczwhd boxes.

    Axis-aligned analog of ``utils/box_util.py get_3d_box`` (heading is always
    zero in the grounding pipeline).

    Args:
        boxes: (..., 6) cxcyczwhd.

    Returns:
        (..., 8, 3) corner coordinates in the canonical order
        (±x, ±y, ±z) with x fastest.
    """
    center = boxes[..., None, 0:3]
    half = 0.5 * boxes[..., None, 3:6]
    signs = jnp.array(
        [
            [-1, -1, -1],
            [1, -1, -1],
            [-1, 1, -1],
            [1, 1, -1],
            [-1, -1, 1],
            [1, -1, 1],
            [-1, 1, 1],
            [1, 1, 1],
        ],
        dtype=boxes.dtype,
    )
    return center + half * signs
