"""ScanNet class configurations (18-class detection vocab + full vocab).

Equivalent of the reference's ``ScannetDatasetConfig`` pair
(``data/model_util_scannet.py:15-34``): DC18 is the standard VoteNet
18-class benchmark vocabulary with its NYU40 id mapping; DC485 covers the
full instance vocabulary derived from the ScanNet label TSV.
"""

from __future__ import annotations

import functools
from typing import Dict, List

from eda_tpu.data.vocab import LABELS_TSV
from eda_tpu.data.scannet import read_label_mapping

# The VoteNet/ScanNet 18-class detection benchmark (public constants).
CLASSES_18: List[str] = [
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "showercurtrain", "toilet", "sink", "bathtub", "garbagebin",
]
NYU40_IDS_18 = [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]


class DatasetConfig18:
    """18-way detection vocabulary with NYU40 bridging."""

    num_class = 18

    def __init__(self):
        self.type2class: Dict[str, int] = {c: i for i, c in enumerate(CLASSES_18)}
        self.class2type = {i: c for c, i in self.type2class.items()}
        self.nyu40ids = list(NYU40_IDS_18)
        self.nyu40id2class = {nid: i for i, nid in enumerate(self.nyu40ids)}


@functools.lru_cache(maxsize=1)
def dc18() -> DatasetConfig18:
    return DatasetConfig18()


@functools.lru_cache(maxsize=1)
def raw_to_nyu40() -> Dict[str, int]:
    """raw instance label -> nyu40 id (scannetv2-labels.combined.tsv)."""
    return read_label_mapping(LABELS_TSV, "raw_category", "nyu40id")


@functools.lru_cache(maxsize=1)
def raw_to_nyu40class() -> Dict[str, str]:
    return read_label_mapping(LABELS_TSV, "raw_category", "nyu40class")


@functools.lru_cache(maxsize=1)
def raw_to_tsv_id() -> Dict[str, int]:
    """raw instance label -> TSV 'id' column (the reference's self.label_map,
    joint_det_dataset.py:86-90)."""
    return {k: int(v) for k, v in read_label_mapping(
        LABELS_TSV, "raw_category", "id"
    ).items()}


# ---------------------------------------------------------------------------
# 485-class object vocabulary (the butd box-stream / class-embedding space)
# ---------------------------------------------------------------------------
# The reference indexes detected/scene boxes with DC(485) class ranks
# (joint_det_dataset.py:807-809, 889-900) which key the 485-row
# class_embeddings3d.npy table (bdetr.py:90-95, data/gen_class_embeddings.py).
# The vocabulary is a CURATED 485-name subset of the 607 TSV categories
# (39 names are display aliases, e.g. 'couch' for TSV 'sofa'), so it cannot
# be derived from the TSV alone; class485_vocab.tsv records it as data
# (rank, TSV id, display name) extracted from the reference's
# data/model_util_scannet.py:28-33 constants — like the typo tables, these
# are vocabulary constants, not code.

CLASS485_TSV = LABELS_TSV.replace(
    "scannetv2-labels.combined.tsv", "class485_vocab.tsv"
)


class DatasetConfig485:
    """485-way object vocabulary with TSV-id bridging (reference DC)."""

    num_class = 485

    def __init__(self):
        import csv

        ranks, names = [], []
        with open(CLASS485_TSV, newline="") as f:
            for row in csv.DictReader(f, delimiter="\t"):
                ranks.append(int(row["tsv_id"]))
                names.append(row["name"])
        self.type2class: Dict[str, int] = {n: i for i, n in enumerate(names)}
        self.class2type = {i: n for i, n in enumerate(names)}
        self.nyu40ids = ranks  # TSV ids despite the reference's field name
        self.nyu40id2class = {tid: i for i, tid in enumerate(ranks)}


@functools.lru_cache(maxsize=1)
def dc485() -> DatasetConfig485:
    return DatasetConfig485()


@functools.lru_cache(maxsize=1)
def class485_names() -> List[str]:
    """The 485 display names in class-rank order (embedding-table rows)."""
    cfg = dc485()
    return [cfg.class2type[i] for i in range(cfg.num_class)]


def instance_label_in_class485(label: str) -> bool:
    """The reference's scene-object keep filter
    (``label_map[...] in DC.nyu40id2class``, joint_det_dataset.py:889-893)."""
    return raw_to_tsv_id().get(label) in dc485().nyu40id2class


def instance_label_to_class485(label: str, default: int = 0) -> int:
    """raw instance label -> 485-way class rank
    (``DC.nyu40id2class[label_map[c]]``, joint_det_dataset.py:807-809).

    The reference KeyErrors on out-of-vocab labels (unreachable in practice:
    GroupFree detections and kept scene objects are always in-vocab);
    ``default`` keeps fabricated fixtures safe.
    """
    return dc485().nyu40id2class.get(raw_to_tsv_id().get(label), default)


def instance_label_to_class18(label: str) -> int:
    """raw instance label -> 18-way class id (17 = other, like DC18 'else 17'
    at joint_det_dataset.py:302)."""
    nyu = raw_to_nyu40().get(label)
    return dc18().nyu40id2class.get(nyu, 17)


# The reference DC18's DISPLAY names (model_util_scannet.py:22-26) — these
# differ from the TSV's nyu40class strings ('couch' vs 'sofa',
# 'refrigerator' vs 'refridgerator', 'other furniture' vs 'otherfurniture').
TYPE2CLASS_18_NAMES: List[str] = [
    "cabinet", "bed", "chair", "couch", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "shower curtain", "toilet", "sink", "bathtub", "other furniture",
]


@functools.lru_cache(maxsize=1)
def _type2class18_by_name() -> Dict[str, int]:
    return {n: i for i, n in enumerate(TYPE2CLASS_18_NAMES)}


def instance_label_to_scanrefer18(label: str) -> int:
    """The ScanRefer distractor/unique class mapping: the reference keys
    DC18.type2class by the TSV's nyu40class NAME
    (``DC18.type2class.get(lbl, 17)``, joint_det_dataset.py:295-302), so
    'sofa', 'refridgerator' and 'otherfurniture' objects land on class 17 —
    deliberately different from the id-based instance_label_to_class18."""
    name = raw_to_nyu40class().get(label)
    return _type2class18_by_name().get(name, 17)
