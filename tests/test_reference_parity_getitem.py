"""FULL ``Joint3DDataset.__getitem__`` differential parity (eval mode).

The piecewise data-pipeline oracles (maps algebra, target boxes, scene
objects, detected-box loader, Scan loader — test_reference_parity_data.py)
pin each method; this test pins the GLUE: the reference's actual
``__getitem__`` (``src/joint_det_dataset.py:856-1041``) is run end-to-end on
a fabricated scan + SR3D annotation and every model-consumed output is
compared against ``GroundingDataset.example`` on the same files:

* point cloud assembly order (xyz | color-mean | height) up to our Morton
  presort permutation,
* target/anchor selection with ``detect_intermediate`` (:688-697),
* center/size padding (1000-centers, :711) and box_label_mask,
* all six positive maps incl. the SR3D auxi row-1 substitution (:676-677)
  driven by the auxi pseudo-box search (:756-783),
* point_instance_label slots,
* detected-box stream in both plain-butd (GroupFree .npy) and butd_gt
  (scene-box oracle) modes — the butd_gt comparison additionally pins
  ``_get_scene_objects`` (:717-754) incl. the non-485-class gap row
  ('floor mat'), via mask-compacted row comparison,
* the ' . not mentioned' caption contract (:988-991),
* is_view_dep / is_hard / is_unique hardness flags (:1031-1033).

Both sides share OUR deterministic tokenizer (RoBERTa BPE parity lives in
test_roberta_hf_parity.py); the parse graph is canned and fed to both sides
in their native span formats, so the test isolates assembly, not the
decoupler (corpus-tested in test_decouple.py).
"""

from __future__ import annotations

import importlib
import json

import numpy as np
import pytest

pytest.importorskip("torch")

from tests.test_reference_parity_data import (  # noqa: E402
    REF,
    _ShimPlyData,
    _Tokenizer,
    _our_tok,
    ref_jd,  # noqa: F401  (imported fixture)
)

from eda_tpu.data.ply import write_ply_vertices

SCAN_ID = "scene0000_00"  # a real id: the axis-alignment JSON needs it

# "the brown chair near the second table it faces" — char spans:
UTT = "the brown chair near the second table it faces"
SPAN_MAIN = [10, 15]  # chair
SPAN_MOD = [4, 9]  # brown
SPAN_REL = [16, 20]  # near
SPAN_OTHER = [32, 37]  # table
SPAN_PRON = [38, 40]  # it


def _write_scene(tmp_path, n=2000, seed=7):
    """Four objects: chair(0), table(1), 'treadmill'(2, a real tsv category
    NOT in the 485-class vocab -> a gap row in the scene-object mask),
    table(3)."""
    rng = np.random.default_rng(seed)
    d = tmp_path / SCAN_ID
    d.mkdir()
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    write_ply_vertices(
        str(d / f"{SCAN_ID}_vh_clean_2.ply"),
        {
            "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
            "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
        },
    )
    seg = np.zeros(n, int)
    seg[200:500] = 1
    seg[500:900] = 2
    seg[900:1200] = 3
    seg[1200:1500] = 4
    with open(d / f"{SCAN_ID}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg.tolist()}, f)
    groups = [
        {"objectId": 0, "segments": [1], "label": "chair"},
        {"objectId": 1, "segments": [2], "label": "table"},
        {"objectId": 2, "segments": [3], "label": "treadmill"},
        {"objectId": 3, "segments": [4], "label": "table"},
    ]
    with open(d / f"{SCAN_ID}.aggregation.json", "w") as f:
        json.dump({"segGroups": groups}, f)


def _write_groupfree(tmp_path, seed=11):
    d = tmp_path / "group_free_pred_bboxes" / "group_free_pred_bboxes_val"
    d.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    lo = rng.uniform(-2, 0, (5, 3))
    hi = lo + rng.uniform(0.3, 1.5, (5, 3))
    corners = np.concatenate([lo, hi], -1).astype(np.float32)
    classes = ["chair", "table", "sofa", "trash can", "lamp"]
    logits = rng.normal(size=(5, 485)).astype(np.float32)
    np.save(
        d / f"{SCAN_ID}.npy",
        {"box": corners, "class": classes, "logits": logits},
    )


def _graph_nodes():
    main = {
        "node_id": 0,
        "node_type": "Object",
        "target_char_span": [SPAN_MAIN],
        "mod_char_span": [SPAN_MOD],
        "pron_char_span": [SPAN_PRON],
        "rel_char_span": [SPAN_REL],
    }
    other = {
        "node_id": 1,
        "node_type": "Object",
        "target_char_span": [SPAN_OTHER],
        "mod_char_span": [],
        "pron_char_span": [],
        "rel_char_span": [],
        "lemma_head": "table",
    }
    return [main, other]


def _ref_anno():
    nodes = _graph_nodes()
    return {
        "scan_id": SCAN_ID,
        "target_id": 0,
        "distractor_ids": [3],
        "anchor_ids": [1],
        "anchors": ["table"],
        "target": "chair",
        "utterance": UTT,
        "dataset": "sr3d",
        "graph_node": nodes,
        "graph_edge": [],
        "auxi_entity": nodes[1],
    }


def _our_anno():
    return {
        "scan_id": SCAN_ID,
        "target_id": 0,
        "distractor_ids": [3],
        "anchor_ids": [1],
        "anchors": ["table"],
        "target": "chair",
        "utterance": UTT,
        "dataset": "sr3d",
        "decoupled": {
            "main": [tuple(SPAN_MAIN)],
            "modifiers": [tuple(SPAN_MOD)],
            "pronouns": [tuple(SPAN_PRON)],
            "relations": [tuple(SPAN_REL)],
            "others": [tuple(SPAN_OTHER)],
            "auxi": [tuple(SPAN_OTHER)],
            "auxi_lemma": "table",
        },
    }


def _ref_dataset(
    ref_jd, tmp_path, ref_scan, *, butd_gt, use_height, multiview_path=None
):
    import csv

    label_map = {}
    with open(f"{REF}/data/meta_data/scannetv2-labels.combined.tsv") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            label_map[row["raw_category"]] = int(row["id"])

    ds = object.__new__(ref_jd.Joint3DDataset)
    ds.split = "val"
    ds.test_dataset = "sr3d"
    ds.annos = [_ref_anno()]
    ds.scans = {SCAN_ID: ref_scan}
    ds.joint_det = False
    ds.augment = False
    ds.use_color = True
    ds.use_height = use_height
    ds.use_multiview = multiview_path is not None
    ds.multiview_path = multiview_path
    ds.multiview_data = {}
    ds.detect_intermediate = True
    ds.butd = True
    ds.butd_gt = butd_gt
    ds.butd_cls = False
    ds.augment_det = False
    ds.visualize = False
    ds.data_path = str(tmp_path)
    ds.mean_rgb = np.array([109.8, 97.2, 83.8]) / 256
    ds.label_map = label_map
    ds.tokenizer = _Tokenizer(_our_tok())
    return ds


def _our_dataset(tmp_path, our_scan, *, butd_gt, use_height, multiview_path=None):
    from eda_tpu.data.dataset import GroundingDataset

    return GroundingDataset(
        {SCAN_ID: our_scan},
        [_our_anno()],
        split="val",
        use_color=True,
        augment=False,
        detect_intermediate=True,
        butd=not butd_gt,
        butd_gt=butd_gt,
        tokenizer=_our_tok(),
        detected_dir=str(tmp_path / "group_free_pred_bboxes"),
        use_height=use_height,
        multiview_path=multiview_path,
    )


@pytest.mark.parametrize(
    "butd_gt,use_height,use_multiview",
    [
        (False, False, False),
        (False, True, False),
        (True, False, False),
        (False, True, True),
    ],
    ids=["butd", "butd+height", "butd_gt", "butd+height+multiview"],
)
def test_getitem_full_parity(
    ref_jd, tmp_path, monkeypatch, butd_gt, use_height, use_multiview
):
    from eda_tpu.data.class_config import instance_label_in_class485
    from eda_tpu.data.positive_maps import build_positive_maps, not_mentioned_suffix
    from eda_tpu.data.presort import morton_sort
    from eda_tpu.data.scannet import Scan

    # 'treadmill' must be the 485-vocab gap this test relies on
    assert not instance_label_in_class485("treadmill")

    _write_scene(tmp_path)
    _write_groupfree(tmp_path)

    vdh = importlib.import_module("src.visual_data_handlers")
    monkeypatch.setattr(vdh, "PlyData", _ShimPlyData)
    # the reference casts with the NumPy<2 alias np.bool8 (:1016)
    monkeypatch.setattr(np, "bool8", np.bool_, raising=False)
    monkeypatch.chdir(REF)  # meta_data/* are cwd-relative in the reference
    ref_scan = vdh.Scan(SCAN_ID, str(tmp_path))
    with open(f"{REF}/data/meta_data/scans_axis_alignment_matrices.json") as f:
        matrix = json.load(f)[SCAN_ID]
    our_scan = Scan(SCAN_ID, str(tmp_path), axis_alignment=np.asarray(matrix))
    # no dedup in this scene: object ids == positions on both sides
    assert len(ref_scan.three_d_objects) == len(our_scan.three_d_objects) == 4

    multiview_path = None
    if use_multiview:
        import h5py

        multiview_path = str(tmp_path / "enet_feats_maxpool.hdf5")
        rng = np.random.default_rng(13)
        with h5py.File(multiview_path, "w") as f:
            f[SCAN_ID] = rng.normal(
                size=(len(our_scan.pc), 8)
            ).astype(np.float32)

    ref_ds = _ref_dataset(
        ref_jd, tmp_path, ref_scan, butd_gt=butd_gt, use_height=use_height,
        multiview_path=multiview_path,
    )
    ref = ref_ds[0]
    ours_ds = _our_dataset(
        tmp_path, our_scan, butd_gt=butd_gt, use_height=use_height,
        multiview_path=multiview_path,
    )
    item = ours_ds.example(0)
    inputs, targets, hard = item["inputs"], item["targets"], item["hardness"]

    # --- caption contract (:988-991)
    assert ref["utterances"] == not_mentioned_suffix(UTT)

    # --- point cloud: same rows up to our Morton presort permutation
    n = len(our_scan.pc)
    perm = morton_sort(our_scan.pc, np.arange(n))[1]
    want_cols = 6 + (1 if use_height else 0) + (8 if use_multiview else 0)
    assert ref["point_clouds"].shape == (n, want_cols)
    np.testing.assert_allclose(
        inputs["point_clouds"], ref["point_clouds"][perm], atol=3e-4
    )
    np.testing.assert_array_equal(
        targets["point_instance_label"], ref["point_instance_label"][perm]
    )

    # --- GT boxes: target + first anchor (detect_intermediate, :688-697),
    # 1000-padded centers (:711)
    np.testing.assert_allclose(
        targets["center_label"], ref["center_label"], atol=3e-4
    )
    np.testing.assert_allclose(targets["size_gts"], ref["size_gts"], atol=3e-4)
    np.testing.assert_array_equal(
        targets["box_label_mask"], ref["box_label_mask"]
    )
    assert targets["box_label_mask"].sum() == 2  # chair + table anchor

    # --- all six positive maps; row 1 of the target map carries the auxi
    # map on SR3D because the pseudo-box search resolves a 'table' near the
    # chair (:676-677, :756-783)
    for ours_key, ref_key in [
        ("positive_map", "positive_map"),
        ("modify_positive_map", "modify_positive_map"),
        ("pron_positive_map", "pron_positive_map"),
        ("other_entity_map", "other_entity_map"),
        ("rel_positive_map", "rel_positive_map"),
    ]:
        np.testing.assert_allclose(
            targets[ours_key], ref[ref_key], atol=1e-6, err_msg=ours_key
        )
    assert ref["positive_map"][1].sum() > 0  # the auxi row actually engaged
    tok = _our_tok().encode_batch([not_mentioned_suffix(UTT)], max_len=256)
    maps = build_positive_maps(tok, 0, _our_anno()["decoupled"])
    np.testing.assert_allclose(
        maps["auxi"], ref["auxi_entity_positive_map"][0], atol=1e-6
    )

    # --- detected-box stream: mask-compacted rows (the reference keeps gap
    # rows for non-485 objects in butd_gt; we compact — same masked content)
    ref_mask = ref["all_detected_bbox_label_mask"].astype(bool)
    our_mask = inputs["det_mask"].astype(bool)
    assert ref_mask.sum() == our_mask.sum() == (3 if butd_gt else 5)
    np.testing.assert_allclose(
        inputs["det_boxes"][our_mask],
        ref["all_detected_boxes"][ref_mask],
        atol=3e-4,
    )
    np.testing.assert_array_equal(
        inputs["det_class_ids"][our_mask],
        ref["all_detected_class_ids"][ref_mask],
    )
    if not butd_gt:
        np.testing.assert_allclose(
            inputs["det_logits"][our_mask],
            ref["all_detected_logits"][ref_mask],
            atol=1e-6,
        )
    else:
        # pinned deviation: the reference's butd_gt substitution replaces
        # boxes/classes/mask but LEAKS the GroupFree logits loaded earlier
        # (:951-957 overwrite only three of the four arrays), leaving
        # all_detected_logits misaligned with the substituted boxes. Nothing
        # in the training graph consumes them; we zero them instead.
        assert not inputs["det_logits"].any()
        assert ref["all_detected_logits"].any()

    # --- hardness flags (:1031-1033)
    assert hard["is_view_dep"] == bool(ref["is_view_dep"])
    assert hard["is_hard"] == bool(ref["is_hard"])
    assert hard["is_unique"] == bool(ref["is_unique"])


# ---------------------------------------------------------------------------
# scannet detection-prompt branch (--joint_det items)
# ---------------------------------------------------------------------------


def _ref_scannet_anno():
    """load_scannet_annos template (:355-364): fields get populated inside
    __getitem__ for dataset='scannet'."""
    return {
        "scan_id": SCAN_ID,
        "target_id": [],
        "distractor_ids": [],
        "utterance": "",
        "target": [],
        "anchors": [],
        "anchor_ids": [],
        "dataset": "scannet",
    }


def test_getitem_scannet_prompt_parity(ref_jd, tmp_path, monkeypatch):
    """The reference's __getitem__ on a dataset='scannet' item (eval split:
    fixed 18-class prompt, :869-911) vs DetectionPromptDataset.example with
    butd=True: target selection by 18-class membership, per-slot positive
    maps over the class-name spans, 1000-padded centers, sem-cls ranks, the
    GroupFree detected-box stream, and the prompt caption contract."""
    import csv

    from eda_tpu.data.class_config import instance_label_to_class18
    from eda_tpu.data.detection_prompt import (
        PROMPT_NAMES,
        DetectionPromptDataset,
    )
    from eda_tpu.data.presort import morton_sort
    from eda_tpu.data.scannet import Scan

    _write_scene(tmp_path)
    _write_groupfree(tmp_path)

    vdh = importlib.import_module("src.visual_data_handlers")
    monkeypatch.setattr(vdh, "PlyData", _ShimPlyData)
    monkeypatch.setattr(np, "bool8", np.bool_, raising=False)
    monkeypatch.chdir(REF)
    ref_scan = vdh.Scan(SCAN_ID, str(tmp_path))
    with open(f"{REF}/data/meta_data/scans_axis_alignment_matrices.json") as f:
        matrix = json.load(f)[SCAN_ID]
    our_scan = Scan(SCAN_ID, str(tmp_path), axis_alignment=np.asarray(matrix))

    ref_ds = _ref_dataset(
        ref_jd, tmp_path, ref_scan, butd_gt=False, use_height=False
    )
    label_map18 = {}
    with open(f"{REF}/data/meta_data/scannetv2-labels.combined.tsv") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            label_map18[row["raw_category"]] = int(row["nyu40id"])
    ref_ds.label_map18 = label_map18
    ref_ds.annos = [_ref_scannet_anno()]
    ref = ref_ds[0]

    ours_ds = DetectionPromptDataset(
        {SCAN_ID: our_scan},
        split="val",
        use_color=True,
        augment=False,
        tokenizer=_our_tok(),
        detected_dir=str(tmp_path / "group_free_pred_bboxes"),
    )
    item = ours_ds.example(0, butd=True)
    inputs, targets, hard = item["inputs"], item["targets"], item["hardness"]

    # fixed 18-class prompt caption (:397-409, :988-991)
    assert ref["utterances"] == " . ".join(PROMPT_NAMES) + " . not mentioned"

    # targets: chair, both tables AND the treadmill (nyu40 39,
    # 'otherfurniture') are all in the 18-class benchmark
    assert ref["box_label_mask"].sum() == 4
    np.testing.assert_array_equal(
        targets["box_label_mask"], ref["box_label_mask"]
    )
    np.testing.assert_allclose(
        targets["center_label"], ref["center_label"], atol=3e-4
    )
    np.testing.assert_allclose(targets["size_gts"], ref["size_gts"], atol=3e-4)

    # sem-cls ranks for the selected targets (:969-975)
    want_cls = [
        instance_label_to_class18(lbl)
        for lbl in ("chair", "table", "treadmill", "table")
    ]
    assert ref["sem_cls_label"][:4].tolist() == want_cls

    # point cloud + instance slots up to the Morton presort permutation
    n = len(our_scan.pc)
    perm = morton_sort(our_scan.pc, np.arange(n))[1]
    np.testing.assert_allclose(
        inputs["point_clouds"], ref["point_clouds"][perm], atol=3e-4
    )
    np.testing.assert_array_equal(
        targets["point_instance_label"], ref["point_instance_label"][perm]
    )

    # per-slot positive maps over the class-name spans (:520-573); the
    # decoupled maps are all empty for prompts
    np.testing.assert_allclose(
        targets["positive_map"], ref["positive_map"], atol=1e-6
    )
    for key in (
        "modify_positive_map",
        "pron_positive_map",
        "other_entity_map",
        "rel_positive_map",
    ):
        assert not targets[key].any() and not ref[key].any(), key

    # GroupFree detected-box stream rides prompt items too (:948-963)
    ref_mask = ref["all_detected_bbox_label_mask"].astype(bool)
    our_mask = inputs["det_mask"].astype(bool)
    assert ref_mask.sum() == our_mask.sum() == 5
    np.testing.assert_allclose(
        inputs["det_boxes"][our_mask],
        ref["all_detected_boxes"][ref_mask],
        atol=3e-4,
    )
    np.testing.assert_array_equal(
        inputs["det_class_ids"][our_mask],
        ref["all_detected_class_ids"][ref_mask],
    )
    np.testing.assert_allclose(
        inputs["det_logits"][our_mask],
        ref["all_detected_logits"][ref_mask],
        atol=1e-6,
    )

    # hardness: empty distractor lists -> False/True on both sides
    assert hard["is_hard"] == bool(ref["is_hard"]) is False
    assert hard["is_unique"] == bool(ref["is_unique"]) is True
