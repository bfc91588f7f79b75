"""Train-time point-cloud augmentation (host numpy).

Port of the reference ``src/joint_det_dataset.py:421-466`` semantics:
view-dependence-gated z-rotation (90-degree multiples +-5 degrees) and
yz/xz flips, small x/y rotations (+-2.5 degrees), 5e-3 positive noise,
+-0.5 shift, 0.98-1.02 scale, and per-point color jitter around the dataset
mean RGB. Boxes are transformed with the same rigid transform
(``joint_det_dataset.py:823-835``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

MEAN_RGB = np.array([109.8, 97.2, 83.8], np.float32) / 256.0  # joint_det_dataset.py:83

VIEW_DEP_WORDS = (
    "front", "behind", "back", "right", "left", "facing", "leftmost",
    "rightmost", "looking", "across",
)  # the rel word list of _is_view_dep / _augment_nr3d (joint_det_dataset.py:1043-1068)


def is_view_dependent(utterance: str) -> bool:
    """The EVAL hardness flag: word-set membership over the raw utterance
    (reference ``_is_view_dep``, joint_det_dataset.py:1043-1051)."""
    words = set(utterance.split())
    return any(w in words for w in VIEW_DEP_WORDS)


def rotate_natural(utterance: str) -> bool:
    """The nr3d/scanrefer ROTATION gate — a distinct, substring-based check
    (reference ``_augment_nr3d``, joint_det_dataset.py:1057-1068: an
    utterance STARTING with a rel word still rotates)."""
    padded = utterance + " "
    return not any(f" {w} " in padded for w in VIEW_DEP_WORDS)


def rotate_sr3d(utterance: str) -> bool:
    """The sr3d ROTATION gate: the utterance's canonical relation must not
    be view-dependent (joint_det_dataset.py:497-505 + _find_rel)."""
    from eda_tpu.data.vocab import VIEW_DEP_RELS, find_rel

    return find_rel(utterance) not in VIEW_DEP_RELS


def _rot(theta_deg: float, axis: int) -> np.ndarray:
    t = np.deg2rad(theta_deg)
    c, s = np.cos(t), np.sin(t)
    m = np.eye(3)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    m[i, i] = c
    m[j, j] = c
    m[i, j] = -s if axis != 1 else s
    m[j, i] = s if axis != 1 else -s
    return m


@dataclasses.dataclass
class Augmentation:
    """A sampled rigid transform, applicable to points and boxes."""

    rotation: np.ndarray  # (3, 3) combined R = Rz @ Rx @ Ry order of application
    flip_x: bool
    flip_y: bool
    shift: np.ndarray  # (3,)
    scale: float

    def apply_points(
        self, xyz: np.ndarray, noise: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Flips -> rotations -> (+noise) -> +shift -> *scale, the reference's
        exact operation order (joint_det_dataset.py:425-460: noise lands
        BEFORE the shift/scale, so it is scaled too)."""
        out = xyz.copy()
        if self.flip_x:
            out[:, 0] = -out[:, 0]
        if self.flip_y:
            out[:, 1] = -out[:, 1]
        out = out @ self.rotation.T
        if noise is not None:
            out = out + noise
        return (out + self.shift) * self.scale

    def apply_boxes(self, boxes: np.ndarray) -> np.ndarray:
        """cxcyczwhd boxes; rotation re-derives the axis-aligned extent from
        transformed corners (joint_det_dataset.py:823-835).

        Deliberate deviation: the reference transforms detected boxes as
        rotate-THEN-flip (:825-831) while its point cloud is flipped BEFORE
        rotating (:425-438) — under a flip the two differ by ~2*theta_z of
        rotation, leaving detected boxes rotated away from the scene they
        describe (up to ~180 deg at the 90/270-degree z-rotations). We apply
        the SAME composite as the points so the box stream stays aligned."""
        out = boxes.copy()
        centers, sizes = out[:, :3], out[:, 3:]
        corners = np.stack(
            [
                centers + sizes / 2 * np.array(sgn)
                for sgn in [
                    (x, y, z) for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)
                ]
            ],
            axis=1,
        )  # (N, 8, 3)
        flat = corners.reshape(-1, 3)
        if self.flip_x:
            flat[:, 0] = -flat[:, 0]
        if self.flip_y:
            flat[:, 1] = -flat[:, 1]
        flat = (flat @ self.rotation.T + self.shift) * self.scale
        corners = flat.reshape(-1, 8, 3)
        mn, mx = corners.min(1), corners.max(1)
        return np.concatenate([(mn + mx) / 2, mx - mn], -1)


def sample_augmentation(
    rng: np.random.Generator, rotate: bool
) -> Augmentation:
    """Sample the reference's augmentation parameters."""
    if rotate:
        theta_z = 90 * rng.integers(0, 4) + (2 * rng.random() - 1) * 5
        flip_x = rng.random() > 0.5
        flip_y = rng.random() > 0.5
    else:
        theta_z = (2 * rng.random() - 1) * 5
        flip_x = flip_y = False
    theta_x = (2 * rng.random() - 1) * 2.5
    theta_y = (2 * rng.random() - 1) * 2.5
    rotation = _rot(theta_y, 1) @ _rot(theta_x, 0) @ _rot(float(theta_z), 2)
    return Augmentation(
        rotation=rotation,
        flip_x=bool(flip_x),
        flip_y=bool(flip_y),
        shift=rng.random(3) - 0.5,
        scale=0.98 + 0.04 * rng.random(),
    )


def augment_scene(
    rng: np.random.Generator,
    xyz: np.ndarray,
    color: Optional[np.ndarray],
    boxes: np.ndarray,
    rotate: bool,
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, Augmentation]:
    """Jointly augment points, colors, and boxes.

    Returns the sampled :class:`Augmentation` too so callers can transform
    other box streams (detected GroupFree boxes) with the identical rigid
    transform — the reference's "Match current augmentations" block
    (``joint_det_dataset.py:825-835``).
    """
    aug = sample_augmentation(rng, rotate)
    new_xyz = aug.apply_points(xyz, noise=rng.random((len(xyz), 3)) * 5e-3)
    new_boxes = aug.apply_boxes(boxes)
    new_color = color
    if color is not None:
        new_color = (color + MEAN_RGB) * (
            0.98 + 0.04 * rng.random((len(color), 3))
        ) - MEAN_RGB
    return new_xyz.astype(np.float32), new_color, new_boxes.astype(np.float32), aug
