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
def full_class_list() -> List[str]:
    """All raw category names in TSV order (the 485-class vocabulary)."""
    import csv

    names = []
    with open(LABELS_TSV, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            names.append(row["raw_category"])
    return names


@functools.lru_cache(maxsize=1)
def raw_to_full_id() -> Dict[str, int]:
    return {name: i for i, name in enumerate(full_class_list())}


def instance_label_to_class18(label: str) -> int:
    """raw instance label -> 18-way class id (17 = other, like DC18 'else 17'
    at joint_det_dataset.py:302)."""
    nyu = raw_to_nyu40().get(label)
    return dc18().nyu40id2class.get(nyu, 17)
