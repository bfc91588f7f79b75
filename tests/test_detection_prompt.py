"""Detection-prompt dataset + mixing tests."""

import numpy as np

from eda_tpu.data.detection_prompt import DetectionPromptDataset, MixedDataset


class FakeObj(dict):
    pass


class FakeScan:
    """Minimal Scan stand-in (pc, color, three_d_objects, get_object_bbox)."""

    def __init__(self, rng, n=4000, objects=(("chair", 300), ("table", 400))):
        self.pc = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        self.color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        self.three_d_objects = []
        start = 0
        for label, count in objects:
            self.three_d_objects.append(
                {
                    "object_id": len(self.three_d_objects),
                    "points": np.arange(start, start + count),
                    "instance_label": label,
                }
            )
            start += count

    def get_object_bbox(self, i):
        pts = self.pc[self.three_d_objects[i]["points"]]
        mx, mn = pts.max(0), pts.min(0)
        return np.concatenate([(mx + mn) / 2, mx - mn]).astype(np.float32)

    def object_by_id(self, oid):
        return oid


def test_detection_prompt_example(rng):
    scans = {"scene0": FakeScan(rng)}
    ds = DetectionPromptDataset(scans, split="val", augment=False, vocab_size=512)
    assert len(ds) == 1
    ex = ds.example(0)
    # both objects (chair + table are 18-class) become targets
    assert ex["targets"]["box_label_mask"].sum() == 2
    # each target's positive map marks its class-name tokens
    for slot in range(2):
        assert ex["targets"]["positive_map"][slot].sum() > 0
    # prompt utterance covers the full 18-class list at eval
    assert ex["inputs"]["text_mask"].sum() > 18


def test_detection_prompt_train_random(rng):
    scans = {"scene0": FakeScan(rng)}
    ds = DetectionPromptDataset(scans, split="train", augment=True, vocab_size=512)
    a = ds.example(0)
    assert np.isfinite(a["inputs"]["point_clouds"]).all()
    assert a["targets"]["box_label_mask"].sum() >= 1


def test_detection_prompt_butd_keys(rng):
    scans = {"scene0": FakeScan(rng)}
    ds = DetectionPromptDataset(scans, split="val", augment=False, vocab_size=512)
    ex = ds.example(0, butd=True)
    assert ex["inputs"]["det_mask"].sum() == 2


def test_mixed_butd_batch_keys_consistent(rng, tmp_path):
    """Mixed grounding+prompt butd batches must stack IDENTICAL input key
    sets — prompt items previously omitted det_logits, so a batch whose
    first example was a grounding item raised KeyError on stacking (the
    reference emits all_detected_logits for every item,
    joint_det_dataset.py:1027-1030)."""
    from eda_tpu.data.dataset import GroundingDataset

    scans = {"scene0": FakeScan(rng)}
    anno = {
        "scan_id": "scene0",
        "target_id": 0,
        "distractor_ids": [],
        "anchor_ids": [],
        "anchors": [],
        "target": "chair",
        "utterance": "the chair",
        "dataset": "scanrefer",
        "decoupled": {
            "main": [(4, 9)], "modifiers": [], "pronouns": [],
            "relations": [], "others": [], "auxi": [], "auxi_lemma": "",
        },
    }
    g = GroundingDataset(
        scans, [anno], split="train", augment=False, butd=True,
        vocab_size=512,
    )
    det = DetectionPromptDataset(
        scans, split="train", augment=False, tokenizer=g.tokenizer
    )
    mixed = MixedDataset([g, det], multipliers=[1, 1])
    batch = mixed.batch([0, 1], butd=True)  # grounding first, prompt second
    assert sorted(batch["inputs"]) == [
        "det_boxes", "det_class_ids", "det_logits", "det_mask",
        "point_clouds", "text_ids", "text_mask",
    ]
    assert batch["inputs"]["det_logits"].shape[1:] == (132, 485)


def test_prompt_groupfree_detections(rng, tmp_path):
    """With a GroupFree .npy on disk, prompt items load detections exactly
    like grounding items (boxes converted to cxcyczwhd, 485-way ranks,
    logits passthrough) instead of the GT scene-box fallback."""
    scans = {"scene0": FakeScan(rng)}
    d = tmp_path / "group_free_pred_bboxes" / "group_free_pred_bboxes_val"
    d.mkdir(parents=True)
    lo = rng.uniform(-2, 0, (4, 3))
    hi = lo + rng.uniform(0.3, 1.5, (4, 3))
    corners = np.concatenate([lo, hi], -1).astype(np.float32)
    logits = rng.normal(size=(4, 485)).astype(np.float32)
    np.save(
        d / "scene0.npy",
        {"box": corners, "class": ["chair", "table", "sofa", "desk"],
         "logits": logits},
    )
    ds = DetectionPromptDataset(
        scans, split="val", augment=False, vocab_size=512,
        detected_dir=str(tmp_path / "group_free_pred_bboxes"),
    )
    ex = ds.example(0, butd=True)["inputs"]
    assert ex["det_mask"].sum() == 4  # the npy's detections, not GT objects
    want = np.concatenate(
        [(corners[:, :3] + corners[:, 3:]) / 2, corners[:, 3:] - corners[:, :3]],
        -1,
    )
    np.testing.assert_allclose(ex["det_boxes"][:4], want, atol=1e-6)
    np.testing.assert_allclose(ex["det_logits"][:4], logits, atol=1e-6)


def test_mixed_dataset_multipliers(rng):
    scans = {"scene0": FakeScan(rng)}
    det = DetectionPromptDataset(scans, split="val", augment=False, vocab_size=512)
    mixed = MixedDataset([det, det], multipliers=[1, 10])
    assert len(mixed) == 11
    batch = mixed.batch([0, 5, 10])
    assert batch["inputs"]["point_clouds"].shape[0] == 3


def test_tail_chunks_cover_everything():
    """Eval chunking covers the full split with a masked padded tail
    (reference scores every val scan, train_dist_mod.py:202-327)."""
    import train

    for n, bsz in ((7, 3), (6, 3), (1, 4), (9, 4)):
        pairs = train.tail_chunks(n, bsz)
        seen = []
        for idx, valid in pairs:
            assert idx.shape == (bsz,) and valid.shape == (bsz,)
            seen.extend(idx[valid].tolist())
            assert (idx[~valid] == 0).all()
        assert seen == list(range(n))


def test_det_eval_scan_mapping(rng):
    """ds.batch(idx) row i is scan ds.scan_ids[idx[i]] — the gt_classes
    reconstruction in train.evaluate_detection depends on this."""
    scans = {
        f"scene{k}": FakeScan(rng, objects=(("chair", 200 + 50 * k),))
        for k in range(3)
    }
    ds = DetectionPromptDataset(scans, split="val", augment=False, vocab_size=512)
    order = [2, 0, 1]
    batch = ds.batch(order)
    for row, idx in enumerate(order):
        ex = ds.example(idx)
        np.testing.assert_array_equal(
            batch["inputs"]["point_clouds"][row], ex["inputs"]["point_clouds"]
        )
        np.testing.assert_array_equal(
            batch["targets"]["center_label"][row], ex["targets"]["center_label"]
        )


def test_det_eval_valid_mask_drops_padded_rows(rng):
    """evaluate_detection_batch(valid=...) scores only real rows."""
    from eda_tpu.eval.det_branch import evaluate_detection_batch
    from eda_tpu.eval.detection import APCalculator
    from eda_tpu.data.dataset import MAX_NUM_OBJ

    scans = {"scene0": FakeScan(rng)}
    ds = DetectionPromptDataset(scans, split="val", augment=False, vocab_size=512)
    batch = ds.batch([0, 0])
    caption = batch["utterances"][0] if "utterances" in batch else None
    from eda_tpu.data.detection_prompt import PROMPT_NAMES

    caption = " . ".join(PROMPT_NAMES) + " . not mentioned"
    tok = ds.tokenizer.encode_batch([caption], max_len=ds.text_len)
    B, Q, C = 2, 8, 256
    end_points = {
        "last_center": rng.normal(size=(B, Q, 3)).astype(np.float32),
        "last_pred_size": rng.uniform(0.2, 1.0, (B, Q, 3)).astype(np.float32),
        "last_sem_cls_scores": rng.normal(size=(B, Q, C)).astype(np.float32),
    }
    gt_classes = np.zeros((B, MAX_NUM_OBJ), np.int64)

    calc_all = APCalculator(iou_thresh=0.25)
    evaluate_detection_batch(
        calc_all, end_points, batch["targets"], gt_classes, tok, caption
    )
    calc_masked = APCalculator(iou_thresh=0.25)
    evaluate_detection_batch(
        calc_masked, end_points, batch["targets"], gt_classes, tok, caption,
        valid=np.array([True, False]),
    )
    assert len(calc_all._gt) == 2
    assert len(calc_masked._gt) == 1


def test_det_eval_gt_classes_match_dataset_targets(rng):
    """The gt_classes reconstruction in train.evaluate_detection uses the
    SAME strict 18-class membership as the dataset's fixed-prompt target
    selection (joint_det_dataset.py:876-881): a 'wall' object (nyu40 id 1,
    not in the 18) is neither a target nor a GT class; 'sofa' (nyu40 6) is
    kept as class 3 despite its name mismatch with 'couch'."""
    from eda_tpu.data.class_config import (
        NYU40_IDS_18,
        instance_label_to_class18,
        raw_to_nyu40,
    )

    scans = {
        "scene0": FakeScan(
            rng, objects=(("chair", 300), ("wall", 500), ("sofa", 400))
        )
    }
    ds = DetectionPromptDataset(scans, split="val", augment=False, vocab_size=512)
    ex = ds.example(0)
    assert ex["targets"]["box_label_mask"].sum() == 2  # chair + sofa, no wall

    scan = scans["scene0"]
    nyu18 = set(NYU40_IDS_18)
    keep = [
        instance_label_to_class18(o["instance_label"])
        for o in scan.three_d_objects
        if raw_to_nyu40().get(o["instance_label"]) in nyu18
    ]
    assert keep == [2, 3]  # chair, sofa (id-keyed, unlike the ScanRefer pass)


def test_prompt_dataset_height_multiview_channels(rng, tmp_path):
    """--joint_det with height/multiview: prompt examples carry the same
    channel layout as the grounding examples, so MixedDataset batches stack."""
    import h5py

    scans = {"scene0": FakeScan(rng)}
    mv = tmp_path / "mv.hdf5"
    with h5py.File(mv, "w") as f:
        f["scene0"] = rng.normal(size=(len(scans["scene0"].pc), 128)).astype(
            np.float32
        )
    ds = DetectionPromptDataset(
        scans, split="val", augment=False, vocab_size=512,
        use_height=True, multiview_path=str(mv),
    )
    ex = ds.example(0)
    assert ex["inputs"]["point_clouds"].shape == (
        len(scans["scene0"].pc), 3 + 3 + 1 + 128,
    )
    assert np.isfinite(ex["inputs"]["point_clouds"]).all()
