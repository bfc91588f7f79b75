"""Annotation loaders: ScanRefer / SR3D / SR3D+ / NR3D / ScanNet prompts.

Produce the reference's anno dict schema (``src/joint_det_dataset.py:158-409``):

    {scan_id, target_id, distractor_ids, utterance, target, anchors,
     anchor_ids, dataset, unique?, hard?, view_dep?}

All loaders run the text decoupler once per annotation at load time, exactly
like ``Scene_graph_parse`` does for the reference (``:1310-1399``), storing
the span groups under ``decoupled``. Typo normalization mirrors the big
replace tables at ``:1313-1373`` in spirit (whitespace + comma splitting).
"""

from __future__ import annotations

import ast
import csv
import json
import os.path as osp
from collections import defaultdict
from typing import Dict, List

from eda_tpu.data.decouple import decoupled_spans

MAX_DISTRACTORS = 32


def normalize_utterance(utterance: str) -> str:
    """Whitespace/comma normalization (``joint_det_dataset.py:579``)."""
    return " ".join(utterance.replace(",", " ,").split())


def _decouple(annos: List[dict]) -> List[dict]:
    for anno in annos:
        utterance = normalize_utterance(anno["utterance"])
        spans = decoupled_spans(utterance)
        if not spans["main"]:
            # retry with a generic prefix (joint_det_dataset.py:1380-1387)
            prefixed = "This is an object . " + utterance
            spans = decoupled_spans(prefixed)
            utterance = prefixed
        anno["utterance"] = utterance
        anno["decoupled"] = spans
    return annos


def load_scanrefer(
    data_path: str, split: str, wo_obj_name: str = None
) -> List[dict]:
    """ScanRefer JSON annotations (``joint_det_dataset.py:243-330``).

    ``wo_obj_name``: path to the "grounding without object names" annotation
    JSON; when given it replaces the utterance source (the reference's
    ``--wo_obj_name`` eval variant, ``joint_det_dataset.py:252-254``).
    """
    if split in ("val", "test"):
        split = "val"
    base = osp.join(data_path, "ScanRefer", f"ScanRefer_filtered_{split}")
    with open(base + ".txt") as f:
        scan_ids = {line.strip() for line in f}
    with open(base + ".json") as f:
        reader = json.load(f)
    if wo_obj_name:
        with open(wo_obj_name) as f:
            reader = json.load(f)
    annos = [
        {
            "scan_id": anno["scene_id"],
            "target_id": int(anno["object_id"]),
            "distractor_ids": [],
            "utterance": " ".join(anno["token"]),
            "target": " ".join(str(anno["object_name"]).split("_")),
            "anchors": [],
            "anchor_ids": [],
            "dataset": "scanrefer",
        }
        for anno in reader
        if anno["scene_id"] in scan_ids
    ]
    return _decouple(annos)


def load_sr3d(data_path: str, split: str, plus: bool = False) -> List[dict]:
    """SR3D / SR3D+ CSV annotations (``joint_det_dataset.py:158-189``)."""
    name = "sr3d+" if plus else "sr3d"
    path = osp.join(data_path, "refer_it_3d", f"{name}_{split}.csv")
    annos = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            if not bool(ast.literal_eval(row.get("mentions_target_class", "True"))):
                continue
            annos.append(
                {
                    "scan_id": row["scan_id"],
                    "target_id": int(row["target_id"]),
                    "distractor_ids": ast.literal_eval(row["distractor_ids"]),
                    "utterance": row["utterance"],
                    "target": row["instance_type"],
                    "anchors": ast.literal_eval(row["anchors_types"]),
                    "anchor_ids": ast.literal_eval(row["anchor_ids"]),
                    "dataset": "sr3d",
                }
            )
    return _decouple(annos)


def load_nr3d(data_path: str, split: str) -> List[dict]:
    """NR3D CSV annotations (``joint_det_dataset.py:191-239``)."""
    path = osp.join(data_path, "refer_it_3d", f"nr3d_{split}.csv")
    annos = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            if row.get("correct_guess", "True") not in ("True", "true", "1"):
                pass  # kept: the reference keeps all train rows
            annos.append(
                {
                    "scan_id": row["scan_id"],
                    "target_id": int(row["target_id"]),
                    "distractor_ids": [],
                    "utterance": row["utterance"],
                    "target": row["instance_type"],
                    "anchors": [],
                    "anchor_ids": [],
                    "dataset": "nr3d",
                }
            )
    return _decouple(annos)


def compute_scanrefer_flags(
    annos: List[dict], scans: Dict, label_to_class18
) -> None:
    """Distractors + unique/multi flags in place
    (``joint_det_dataset.py:295-330``).

    label_to_class18: callable(instance_label) -> 18-way class id.
    """
    scene2obj = defaultdict(list)
    used = defaultdict(set)
    for anno in annos:
        scan = scans.get(anno["scan_id"])
        if scan is None:
            continue
        labels = [
            label_to_class18(o["instance_label"]) for o in scan.three_d_objects
        ]
        tgt_idx = scan.object_by_id(anno["target_id"])
        if tgt_idx is None:
            continue
        anno["distractor_ids"] = [
            i
            for i in range(len(labels))
            if labels[i] == labels[tgt_idx] and i != tgt_idx
        ][:MAX_DISTRACTORS]
        if anno["target_id"] not in used[anno["scan_id"]]:
            used[anno["scan_id"]].add(anno["target_id"])
            scene2obj[anno["scan_id"]].append(labels[tgt_idx])
    for anno in annos:
        scan = scans.get(anno["scan_id"])
        if scan is None:
            continue
        labels = [
            label_to_class18(o["instance_label"]) for o in scan.three_d_objects
        ]
        tgt_idx = scan.object_by_id(anno["target_id"])
        if tgt_idx is None:
            continue
        anno["unique"] = (
            sum(c == labels[tgt_idx] for c in scene2obj[anno["scan_id"]]) == 1
        )


def load_annotations(
    dataset: str, data_path: str, split: str, debug: bool = False,
    wo_obj_name: str = None,
) -> List[dict]:
    """Dispatch per dataset name; ``debug`` caps at 128 annos
    (``joint_det_dataset.py:150-151``)."""
    if dataset == "scanrefer":
        annos = load_scanrefer(data_path, split, wo_obj_name=wo_obj_name)
    elif dataset == "sr3d":
        annos = load_sr3d(data_path, split)
    elif dataset == "sr3d+":
        annos = load_sr3d(data_path, split, plus=True)
    elif dataset == "nr3d":
        annos = load_nr3d(data_path, split)
    else:
        raise ValueError(f"unknown dataset {dataset}")
    if debug:
        annos = annos[:128]
    return annos
