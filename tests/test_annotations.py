"""Annotation loading: typo tables, per-dataset distractors, NR3D filter."""

import numpy as np
import pytest

from eda_tpu.data.annotations import (
    compute_scanrefer_flags,
    load_nr3d,
    normalize_utterance,
)


def test_scanrefer_typo_table():
    """Literal replace tables (joint_det_dataset.py:1315-1329) apply to
    every dataset."""
    assert normalize_utterance("the 2-tiered shelf") == "the 2 - tiered shelf"
    assert normalize_utterance("it's a 3-seater couch") == (
        "itis a 3 - seater couch"
    )  # 's -> is, verbatim reference quirk
    assert normalize_utterance("theses chairs") == "these chairs"
    # verbatim reference behavior: only a space BEFORE the slash is added
    assert normalize_utterance("a computer/monitor") == "a computer /monitor"
    assert normalize_utterance("a chair, a desk") == "a chair , a desk"


def test_nr3d_typo_table():
    """NR3D-only punctuation/contraction fixes (joint_det_dataset.py:1331-1373)."""
    assert normalize_utterance("the pillow; it's red", "nr3d") == (
        "the pillow ; it is red"
    )
    assert normalize_utterance("thats the one", "nr3d") == "that is the one"
    assert normalize_utterance("you're facing it", "nr3d") == "you are facing it"
    assert normalize_utterance("the left-hand side", "nr3d") == "the left hand side"
    assert normalize_utterance("isnt it? yes!", "nr3d") == "is not it yes !"
    assert normalize_utterance("a (big) box", "nr3d") == "a ( big ) box"
    # scanrefer keeps hyphens/punctuation outside the listed fixes
    assert normalize_utterance("the left-hand side") == "the left-hand side"


class _FakeScan:
    def __init__(self, labels):
        self.three_d_objects = [
            {"instance_label": l, "points": []} for l in labels
        ]

    def object_by_id(self, tid):
        return tid if 0 <= tid < len(self.three_d_objects) else None


def _label18(label):
    table = {"chair": 2, "office chair": 2, "table": 4, "desk": 4}
    return table.get(label, 17)


def test_per_dataset_distractors():
    scans = {
        "scene0": _FakeScan(["chair", "office chair", "chair", "table", "desk"]),
    }
    annos = [
        # scanrefer: 18-class equality — office chair and chair collide
        {"scan_id": "scene0", "target_id": 0, "target": "chair",
         "dataset": "scanrefer", "distractor_ids": []},
        # nr3d: fine-grained instance_type — only exact 'chair' labels
        {"scan_id": "scene0", "target_id": 0, "target": "chair",
         "dataset": "nr3d", "distractor_ids": []},
        # sr3d: CSV-provided distractors survive untouched
        {"scan_id": "scene0", "target_id": 0, "target": "chair",
         "dataset": "sr3d", "distractor_ids": [42]},
    ]
    compute_scanrefer_flags(annos, scans, _label18)
    assert annos[0]["distractor_ids"] == [1, 2]  # 18-class: both chairs
    assert annos[1]["distractor_ids"] == [2]  # fine-grained: exact label only
    assert annos[2]["distractor_ids"] == [42]  # untouched


def test_nr3d_val_filters_correct_guess(tmp_path):
    d = tmp_path / "refer_it_3d"
    d.mkdir()
    header = "scan_id,target_id,utterance,instance_type,correct_guess\n"
    rows = (
        "scene0,1,the chair near the table,chair,True\n"
        "scene0,2,the other chair,chair,False\n"
    )
    for split in ("train", "val"):
        (d / f"nr3d_{split}.csv").write_text(header + rows)
    train = load_nr3d(str(tmp_path), "train")
    val = load_nr3d(str(tmp_path), "val")
    assert len(train) == 2  # train keeps every row
    assert len(val) == 1  # val keeps only correct_guess (ref :216-222)
    assert val[0]["target_id"] == 1
