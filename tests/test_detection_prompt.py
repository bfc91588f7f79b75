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


def test_mixed_dataset_multipliers(rng):
    scans = {"scene0": FakeScan(rng)}
    det = DetectionPromptDataset(scans, split="val", augment=False, vocab_size=512)
    mixed = MixedDataset([det, det], multipliers=[1, 10])
    assert len(mixed) == 11
    batch = mixed.batch([0, 5, 10])
    assert batch["inputs"]["point_clouds"].shape[0] == 3
