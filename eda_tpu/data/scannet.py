"""ScanNet scene store: scans, labels, packing.

Host-side equivalent of ``src/visual_data_handlers.py`` (Scan /
ScanNetMappings) + ``data/scannet_utils.py`` + the pickle packing path of
``src/joint_det_dataset.py:1249-1279`` / ``Pack_scan_files.py``:

* a ``Scan`` loads the ``*_vh_clean_2.ply`` mesh vertices, axis-aligns them
  with the per-scan matrix, downsamples to 50k points with the fixed seed
  1184 (``visual_data_handlers.py:113-122``), and builds per-object point
  index lists from the segs + aggregation JSONs with the duplicate-object
  filter (``:165-178``);
* ``pack_scans`` pickles a whole split into ``{split}_v3scans.pkl`` with a
  process pool, which the dataset unpickles at init.
"""

from __future__ import annotations

import csv
import json
import multiprocessing as mp
import os
import os.path as osp
import pickle
from typing import Dict, List, Optional

import numpy as np

from eda_tpu.data.ply import read_ply_vertices


def object_box_from_points(xyz: np.ndarray, point_idx) -> np.ndarray:
    """Tight axis-aligned cxcyczwhd box over an object's points — the
    reference's get_object_bbox semantics (visual_data_handlers.py:246-259),
    also applied to AUGMENTED clouds (the reference stores the augmented pc
    back into the scan before reading boxes, joint_det_dataset.py:508)."""
    pts = xyz[point_idx]
    mx, mn = pts.max(0), pts.min(0)
    return np.concatenate([(mx + mn) / 2.0, mx - mn]).astype(np.float32)

DOWNSAMPLE_SEED = 1184  # visual_data_handlers.py:113
KEEP_POINTS = 50000


def read_label_mapping(
    tsv_path: str, label_from: str = "raw_category", label_to: str = "id"
) -> Dict[str, int]:
    """raw_category -> id/nyu40id mapping (``data/scannet_utils.py:20-32``)."""
    mapping: Dict[str, int] = {}
    with open(tsv_path, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            value = row[label_to]
            mapping[row[label_from]] = int(value) if value.isdigit() else value
    return mapping


class Scan:
    """One ScanNet scene: 50k downsampled labeled points + object instances.

    Attributes:
        pc: (50000, 3) axis-aligned float32 coordinates.
        color: (50000, 3) float32 in [0, 1).
        three_d_objects: list of {object_id, points (indices into pc),
            instance_label}.
    """

    def __init__(
        self,
        scan_id: str,
        top_scan_dir: str,
        load_objects: bool = True,
        axis_alignment: Optional[np.ndarray] = None,
    ):
        self.scan_id = scan_id
        self.top_scan_dir = top_scan_dir
        self.axis_alignment = axis_alignment
        self.choices: Optional[np.ndarray] = None
        self.pc, self.color = self._load_point_cloud()
        self.three_d_objects: List[dict] = []
        if load_objects:
            self._load_objects()

    def _path(self, suffix: str) -> str:
        return osp.join(self.top_scan_dir, self.scan_id, self.scan_id + suffix)

    def _load_point_cloud(self, keep_points: int = KEEP_POINTS):
        data = read_ply_vertices(self._path("_vh_clean_2.ply"))
        pc = np.stack([data["x"], data["y"], data["z"]], 1).astype(np.float64)
        pc = self.align_to_axes(pc)
        color = (
            np.stack([data["red"], data["green"], data["blue"]], 1) / 256.0
        ).astype(np.float32)

        # Fixed-seed downsample so scan packing is reproducible
        # (visual_data_handlers.py:113-122).
        rs = np.random.RandomState(DOWNSAMPLE_SEED)
        choices = rs.choice(pc.shape[0], keep_points, replace=len(pc) < keep_points)
        self.choices = choices
        self._new_pts = np.zeros(len(pc), int)
        self._new_pts[choices] = np.arange(len(choices))
        return pc[choices].astype(np.float32), color[choices]

    def align_to_axes(self, pc: np.ndarray) -> np.ndarray:
        """Apply the scan's 4x4 axis-alignment matrix
        (visual_data_handlers.py:187-193)."""
        if self.axis_alignment is None:
            return pc
        mat = np.asarray(self.axis_alignment, np.float64).reshape(4, 4)
        homo = np.concatenate([pc, np.ones((len(pc), 1))], 1)
        return (homo @ mat.T)[:, :3]

    def _load_objects(self):
        with open(self._path("_vh_clean_2.0.010000.segs.json")) as f:
            segment_indices = json.load(f)["segIndices"]
        segments: Dict[int, List[int]] = {}
        for i, s in enumerate(segment_indices):
            segments.setdefault(s, []).append(i)

        with open(self._path(".aggregation.json")) as f:
            aggregation = json.load(f)

        objects = []
        for info in aggregation["segGroups"]:
            points: List[int] = []
            for s in info["segments"]:
                points.extend(segments.get(s, []))
            points = np.array(sorted(set(points)))
            if self.choices is not None and len(points):
                points = self._new_pts[points[np.isin(points, self.choices)]]
            objects.append(
                {
                    "object_id": int(info["objectId"]),
                    "points": np.asarray(points),
                    "instance_label": str(info["label"]),
                }
            )
        # duplicate filter (visual_data_handlers.py:165-178)
        kept: List[dict] = []
        for o in objects:
            dup = any(
                len(k["points"]) == len(o["points"])
                and (k["points"] == o["points"]).all()
                for k in kept
            )
            if not dup:
                kept.append(o)
        self.three_d_objects = kept

    def get_object_bbox(self, obj_idx: int) -> np.ndarray:
        """Axis-aligned cxcyczwhd box of an object's points
        (visual_data_handlers.py:246-259)."""
        return object_box_from_points(
            self.pc, self.three_d_objects[obj_idx]["points"]
        )

    def object_by_id(self, object_id: int) -> Optional[int]:
        for i, o in enumerate(self.three_d_objects):
            if o["object_id"] == object_id:
                return i
        return None


def load_axis_alignments(path: str) -> Dict[str, list]:
    """scans_axis_alignment_matrices.json -> scan_id -> 16 floats."""
    with open(path) as f:
        return json.load(f)


def _load_one(args):
    scan_id, scan_dir, alignments = args
    return scan_id, Scan(
        scan_id, scan_dir, axis_alignment=alignments.get(scan_id)
    )


def pack_scans(
    scan_ids: List[str],
    scan_dir: str,
    out_path: str,
    alignments: Optional[Dict[str, list]] = None,
    processes: int = 4,
):
    """Pickle a split of scans (``joint_det_dataset.py:1249-1279``)."""
    alignments = alignments or {}
    args = [(sid, scan_dir, alignments) for sid in scan_ids]
    scans: Dict[str, Scan] = {}
    if processes > 1:
        with mp.Pool(processes) as pool:
            for sid, scan in pool.imap(_load_one, args):
                scans[sid] = scan
    else:
        for a in args:
            sid, scan = _load_one(a)
            scans[sid] = scan
    os.makedirs(osp.dirname(osp.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(scans, f, protocol=pickle.HIGHEST_PROTOCOL)
    return scans


def load_packed_scans(path: str) -> Dict[str, Scan]:
    with open(path, "rb") as f:
        return pickle.load(f)
