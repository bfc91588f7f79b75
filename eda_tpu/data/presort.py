"""Host-side Morton presorting of point clouds.

The fused SA layer wants points in Z-order so ball neighborhoods are
contiguous windows (``ops/fused_sa.py``). Device-side multi-operand sorts
are expensive to compile and run on TPU, but the cloud is static per example
— so the input pipeline sorts once on host (numpy argsort of 50k keys is
~2 ms) right after augmentation, and the model runs with
``points_presorted=True``. Any per-point array (colors, instance labels)
must be permuted together, which this helper does.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def morton_keys_np(xyz: np.ndarray, cell_size: float, origin: float = -50.0) -> np.ndarray:
    """Numpy twin of ``ops.fused_sa.morton_keys`` (same key values)."""
    cells = np.clip(
        np.floor((xyz - origin) / cell_size).astype(np.uint32), 0, 1023
    )

    def spread(v):
        v = (v | (v << 16)) & np.uint32(0x030000FF)
        v = (v | (v << 8)) & np.uint32(0x0300F00F)
        v = (v | (v << 4)) & np.uint32(0x030C30C3)
        v = (v | (v << 2)) & np.uint32(0x09249249)
        return v

    key = (
        spread(cells[..., 0])
        | (spread(cells[..., 1]) << 1)
        | (spread(cells[..., 2]) << 2)
    )
    return key.astype(np.int32)


def morton_sort(
    xyz: np.ndarray, *arrays: np.ndarray, cell_size: float = 0.2
) -> Tuple[np.ndarray, ...]:
    """Sort a point cloud (and aligned per-point arrays) into Morton order.

    Args:
        xyz: (N, 3); arrays: any number of (N, ...) aligned arrays.

    Returns:
        (sorted_xyz, *sorted_arrays).
    """
    order = np.argsort(morton_keys_np(xyz, cell_size), kind="stable")
    return (xyz[order],) + tuple(a[order] for a in arrays)
