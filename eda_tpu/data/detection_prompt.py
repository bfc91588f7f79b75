"""ScanNet detection-prompt dataset (the ``--joint_det`` auxiliary task).

Reference ``src/joint_det_dataset.py:334-409, 520-573, 869-911``: each scene
becomes a detection example whose "utterance" is a ``' . '``-joined list of
class names (the fixed 18-class prompt at eval, or a random sample of up to
10 present classes mixed with negatives at train), and whose targets are all
scene objects of the prompted classes. Positive maps mark each target's
class-name span — no decoupling (attribute/pron/rel maps stay empty).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from eda_tpu.data.class_config import instance_label_to_class18
from eda_tpu.data.dataset import MAX_NUM_OBJ
from eda_tpu.data.positive_maps import MAX_TOKENS, spans_to_map
from eda_tpu.data.presort import morton_sort
from eda_tpu.data.augment import MEAN_RGB, augment_scene
from eda_tpu.models.tokenizer import make_tokenizer

# display names used inside prompts (reference uses 'couch'/'shower curtain'
# style names from DC.class2type)
PROMPT_NAMES = [
    "cabinet", "bed", "chair", "couch", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "shower curtain", "toilet", "sink", "bathtub", "other furniture",
]


class DetectionPromptDataset:
    """Scenes -> detection-prompt examples with the GroundingDataset API."""

    def __init__(
        self,
        scans: Dict,
        *,
        split: str = "train",
        use_color: bool = True,
        augment: bool = True,
        text_len: int = 256,  # match GroundingDataset's bucket (cap at 256)
        tokenizer=None,
        vocab_size: int = 50265,
        seed: int = 0,
    ):
        self.scan_ids = [
            sid
            for sid, scan in scans.items()
            if any(
                instance_label_to_class18(o["instance_label"]) < 18
                for o in scan.three_d_objects
            )
        ]
        self.scans = scans
        self.split = split
        self.use_color = use_color
        self.augment = augment and split == "train"
        self.text_len = text_len
        self.tokenizer = tokenizer or make_tokenizer(vocab_size=vocab_size)
        self.seed = seed

    def __len__(self) -> int:
        return len(self.scan_ids)

    def example(self, idx: int, butd: bool = False) -> dict:
        rng = np.random.default_rng((self.seed * 7_777_777 + idx) % (2**31))
        scan = self.scans[self.scan_ids[idx % len(self.scan_ids)]]

        obj_classes = [
            instance_label_to_class18(o["instance_label"])
            for o in scan.three_d_objects
        ]
        present = sorted({c for c in obj_classes if c < 18})
        random_utt = self.split == "train" and rng.random() > 0.5
        if random_utt:
            sampled = list(present)
            rng.shuffle(sampled)
            sampled = sorted(sampled[:10])
            names = [PROMPT_NAMES[c] for c in sampled]
            # mix in absent-class negatives (joint_det_dataset.py:399-406)
            negatives = [
                PROMPT_NAMES[c] for c in range(18) if c not in sampled
            ][: max(0, 10 - len(names))]
            names = sorted(set(names + negatives))
            rng.shuffle(names)
            prompt_classes = sampled
        else:
            names = list(PROMPT_NAMES)
            prompt_classes = present
        utterance = " . ".join(names)

        # targets: all objects of the prompted classes, in scene order
        target_objs = [
            i
            for i, c in enumerate(obj_classes)
            if c in prompt_classes and PROMPT_NAMES[c] in names
        ][:MAX_NUM_OBJ]

        xyz = scan.pc.copy()
        color = scan.color - MEAN_RGB if self.use_color else None
        gt_boxes = (
            np.stack([scan.get_object_bbox(o) for o in target_objs])
            if target_objs
            else np.zeros((0, 6), np.float32)
        )
        point_instance = -np.ones(len(xyz), np.int32)
        for slot, o in enumerate(target_objs):
            point_instance[scan.three_d_objects[o]["points"]] = slot

        if self.augment and len(gt_boxes):
            xyz, color, gt_boxes, _ = augment_scene(rng, xyz, color, gt_boxes, True)

        caption = utterance + " . not mentioned"
        tok = self.tokenizer.encode_batch([caption], max_len=self.text_len)

        G = MAX_NUM_OBJ
        center_label = np.zeros((G, 3), np.float32)
        center_label[:] = 1000.0
        size_gts = np.zeros((G, 3), np.float32)
        box_label_mask = np.zeros((G,), np.float32)
        n_t = len(target_objs)
        if n_t:
            center_label[:n_t] = gt_boxes[:, :3]
            size_gts[:n_t] = gt_boxes[:, 3:]
            box_label_mask[:n_t] = 1.0

        # per-target positive map: the class-name span in the prompt
        positive_map = np.zeros((G, MAX_TOKENS), np.float32)
        padded = " " + caption + " "
        for slot, o in enumerate(target_objs):
            name = PROMPT_NAMES[obj_classes[o]]
            start = padded.find(" " + name + " ")
            if start < 0:
                continue
            positive_map[slot] = spans_to_map(
                tok, 0, [(start, start + len(name))]
            )

        if color is not None:
            xyz, color, point_instance = morton_sort(xyz, color, point_instance)
            pc = np.concatenate([xyz, color], -1).astype(np.float32)
        else:
            xyz, point_instance = morton_sort(xyz, point_instance)
            pc = xyz.astype(np.float32)

        zeros = np.zeros((G, MAX_TOKENS), np.float32)
        inputs = {
            "point_clouds": pc,
            "text_ids": tok.input_ids[0],
            "text_mask": tok.attention_mask[0],
        }
        if butd:
            # same fallback as GroundingDataset: scene objects as detections
            det_boxes = np.zeros((MAX_NUM_OBJ, 6), np.float32)
            det_mask = np.zeros((MAX_NUM_OBJ,), bool)
            det_cls = np.zeros((MAX_NUM_OBJ,), np.int32)
            scene = [
                (i, c) for i, c in enumerate(obj_classes[:MAX_NUM_OBJ])
            ]
            for slot, (i, c) in enumerate(scene):
                det_boxes[slot] = scan.get_object_bbox(i)
                det_mask[slot] = True
                det_cls[slot] = c
            inputs["det_boxes"] = det_boxes
            inputs["det_class_ids"] = det_cls
            inputs["det_mask"] = det_mask
        targets = {
            "center_label": center_label,
            "size_gts": size_gts,
            "box_label_mask": box_label_mask,
            "positive_map": positive_map,
            "modify_positive_map": zeros,
            "pron_positive_map": zeros.copy(),
            "other_entity_map": zeros.copy(),
            "rel_positive_map": zeros.copy(),
            "point_instance_label": point_instance,
            "text_lengths": np.int32(tok.lengths[0]),
        }
        hardness = {
            "is_view_dep": False,
            "is_hard": n_t > 1,
            "is_unique": n_t <= 1,
        }
        return {"inputs": inputs, "targets": targets, "hardness": hardness}

    def batch(self, indices, butd: bool = False) -> dict:
        examples = [self.example(int(i), butd) for i in indices]

        def stack(key):
            return {
                k: np.stack([np.asarray(e[key][k]) for e in examples])
                for k in examples[0][key]
            }

        return {
            "inputs": stack("inputs"),
            "targets": stack("targets"),
            "hardness": stack("hardness"),
        }


class MixedDataset:
    """Multiplier-weighted mix of datasets (reference ``dataset_dict``
    multipliers; scannet x10 under --joint_det, train_dist_mod.py:50-51)."""

    def __init__(self, parts: List, multipliers: Optional[List[int]] = None):
        self.parts = parts
        multipliers = multipliers or [1] * len(parts)
        self._index: List = []
        for part_idx, (part, mult) in enumerate(zip(parts, multipliers)):
            self._index += [(part_idx, i) for i in range(len(part))] * mult

    def __len__(self) -> int:
        return len(self._index)

    def example(self, idx: int, butd: bool = False) -> dict:
        part_idx, inner = self._index[idx % len(self._index)]
        return self.parts[part_idx].example(inner, butd)

    def batch(self, indices, butd: bool = False) -> dict:
        examples = [self.example(int(i), butd) for i in indices]

        def stack(key):
            return {
                k: np.stack([np.asarray(e[key][k]) for e in examples])
                for k in examples[0][key]
            }

        return {
            "inputs": stack("inputs"),
            "targets": stack("targets"),
            "hardness": stack("hardness"),
        }
