"""GroundingDataset: real-data examples in the model's fixed-shape format.

Host-side equivalent of ``Joint3DDataset.__getitem__``
(``src/joint_det_dataset.py:856-1041``): combines a packed scan store with
annotation records, applies augmentation, builds decoupled positive maps, and
emits {"inputs", "targets", "hardness"} dicts ready for the jitted step.

The reference emits ~30 ragged-ish keys; here the contract is exactly the
arrays the model and criterion consume (same semantics, fixed shapes):

inputs:  point_clouds (N, 3+C), text_ids (L,), text_mask (L,),
         [det_boxes (D, 6), det_class_ids (D,), det_mask (D,)]
targets: center_label/size_gts (G, 3), box_label_mask (G,),
         {positive,modify_positive,pron_positive,other_entity,rel_positive}
         _map (G, 256), point_instance_label (N,), text_lengths ()
hardness: is_view_dep / is_hard / is_unique flags
         (``joint_det_dataset.py:1031-1033``)
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from eda_tpu.data import annotations as anno_lib
from eda_tpu.data.augment import (
    MEAN_RGB,
    augment_scene,
    is_view_dependent,
    rotate_natural,
    rotate_sr3d,
)
from eda_tpu.data.class_config import (
    instance_label_in_class485,
    instance_label_to_class485,
)
from eda_tpu.data.positive_maps import MAX_TOKENS, build_positive_maps, not_mentioned_suffix
from eda_tpu.data.scannet import Scan, load_packed_scans, object_box_from_points
from eda_tpu.models.tokenizer import make_tokenizer

MAX_NUM_OBJ = 132  # joint_det_dataset.py:45


def load_detected(detected_dir, split: str, scan_id: str):
    """GroupFree per-scan detections (``joint_det_dataset.py:785-824``):
    ``group_free_pred_bboxes_{split}/{scan_id}.npy`` holding a dict with
    'box' (xyzxyz), 'class' (raw labels), 'logits'. Returns
    (cxcyczwhd boxes, 485-way class ranks, logits) or None when absent."""
    path = osp.join(
        detected_dir or "",
        f"group_free_pred_bboxes_{split}",
        f"{scan_id}.npy",
    )
    if not detected_dir or not osp.exists(path):
        return None
    d = np.load(path, allow_pickle=True).item()
    corners = np.asarray(d["box"], np.float32)
    boxes = np.concatenate(
        [(corners[:, :3] + corners[:, 3:]) / 2, corners[:, 3:] - corners[:, :3]],
        1,
    )
    # 485-way ranks: the ids key the class-embedding table rows
    # (joint_det_dataset.py:807-809 -> bdetr.py:239)
    classes = np.array(
        [instance_label_to_class485(str(c)) for c in d["class"]], np.int32
    )
    logits = np.asarray(d["logits"], np.float32) if "logits" in d else None
    return boxes, classes, logits


def load_cls_results(detected_dir) -> dict:
    """Per-scan predicted object classes for --butd_cls
    (``data/cls_results.json``, joint_det_dataset.py:114-116,960-963).
    Empty dict when the file is absent."""
    path = osp.join(detected_dir or "", "..", "cls_results.json")
    if detected_dir and osp.exists(path):
        import json

        with open(path) as f:
            return json.load(f)
    return {}


def _corrupt_detections(rng, boxes: np.ndarray, classes: np.ndarray):
    """--augment_det box corruption: with p=0.3 a detected box is replaced by
    a random box in the scene extent and a random 485-way class
    (``joint_det_dataset.py:837-849``: randint over len(DC.nyu40ids)=485)."""
    if not len(boxes):
        return boxes, classes
    lo, hi = boxes.min(0), boxes.max(0)
    rand_box = (hi - lo)[None] * rng.random(boxes.shape) + lo
    corrupt = rng.random(len(boxes)) > 0.7
    out_boxes = np.where(corrupt[:, None], rand_box, boxes)
    out_classes = np.where(
        corrupt, rng.integers(0, 485, len(classes)), classes
    ).astype(classes.dtype)
    return out_boxes, out_classes


class GroundingDataset:
    """Scan + annotation dataset producing fixed-shape training examples."""

    def __init__(
        self,
        scans: Dict[str, Scan],
        annos: List[dict],
        *,
        split: str = "train",
        use_color: bool = True,
        augment: bool = True,
        detect_intermediate: bool = True,
        butd: bool = False,
        butd_gt: bool = False,
        butd_cls: bool = False,
        text_len: int = MAX_TOKENS,  # reference caps at 256 (joint_det_dataset.py:560)
        tokenizer=None,
        vocab_size: int = 50265,
        seed: int = 0,
        augment_det: bool = False,
        detected_dir: str = None,
        use_height: bool = False,
        multiview_path: str = None,
    ):
        self.scans = scans
        self.annos = [a for a in annos if a["scan_id"] in scans]
        self.split = split
        self.use_color = use_color
        self.augment = augment and split == "train"
        self.detect_intermediate = detect_intermediate
        self.butd = butd or butd_gt or butd_cls
        self.butd_gt = butd_gt
        self.butd_cls = butd_cls
        self.augment_det = augment_det
        self.detected_dir = detected_dir
        self.use_height = use_height
        self.multiview_path = multiview_path
        self.text_len = text_len
        self.tokenizer = tokenizer or make_tokenizer(vocab_size=vocab_size)
        self.seed = seed
        # the reference keys this pass by nyu40class NAME, not id — 'sofa' /
        # 'refridgerator' / 'otherfurniture' objects count as class 17 for
        # distractor/unique purposes (joint_det_dataset.py:295-302)
        from eda_tpu.data.class_config import instance_label_to_scanrefer18

        anno_lib.compute_scanrefer_flags(
            self.annos, self.scans, instance_label_to_scanrefer18
        )

    @classmethod
    def from_args(cls, args, split: str) -> "GroundingDataset":
        """Build from the train.py CLI namespace (reference flag surface)."""
        scans_path = osp.join(args.data_root, f"{split}_v3scans.pkl")
        scans = load_packed_scans(scans_path)
        annos: List[dict] = []
        for name in args.dataset:
            if name == "synthetic":
                continue
            annos.extend(
                anno_lib.load_annotations(
                    name, args.data_root, split, debug=args.debug,
                    wo_obj_name=getattr(args, "wo_obj_name", None),
                )
            )
        # the real RoBERTa tokenizer when {data_root}/roberta-base exists
        # (ref bdetr.py:76-78); hash tokenizer otherwise
        tok_path = osp.join(args.data_root, "roberta-base")
        tokenizer = make_tokenizer(tok_path if osp.isdir(tok_path) else None)
        from eda_tpu.models.tokenizer import SimpleTokenizer

        if isinstance(tokenizer, SimpleTokenizer):
            # hash ids silently alias words and their boundaries are
            # word-level, not BPE — the positive maps that supervise the
            # dense-alignment losses would diverge from the reference's
            # (joint_det_dataset.py:1150-1177). SimpleTokenizer is for
            # synthetic data only: real datasets HARD-ERROR (the native
            # byte-level BPE needs only vocab.json+merges.txt on disk, no
            # transformers install — models/bpe.py). Escape hatch for
            # deliberate throwaway experiments: EDA_TPU_ALLOW_HASH_TOKENIZER.
            msg = (
                "real dataset %s resolved to the hash-id SimpleTokenizer "
                "(no usable %s); token ids and subword boundaries will NOT "
                "match the reference's RoBERTa vocabulary. Provide "
                "vocab.json+merges.txt under that path (served natively by "
                "eda_tpu.models.bpe, no transformers needed), or set "
                "EDA_TPU_ALLOW_HASH_TOKENIZER=1 to proceed anyway."
                % (args.dataset, tok_path)
            )
            import os as _os

            if not _os.environ.get("EDA_TPU_ALLOW_HASH_TOKENIZER"):
                raise RuntimeError(msg)
            import logging

            logging.getLogger("eda_tpu").warning(msg)
        return cls(
            scans,
            annos,
            split=split,
            use_color=args.use_color,
            augment=getattr(args, "augment", True),
            detect_intermediate=args.detect_intermediate,
            butd=args.butd,
            butd_gt=args.butd_gt,
            butd_cls=args.butd_cls,
            tokenizer=tokenizer,
            augment_det=getattr(args, "augment_det", False),
            detected_dir=osp.join(args.data_root, "group_free_pred_bboxes"),
            use_height=getattr(args, "use_height", False),
            # reference multiview store path (joint_det_dataset.py:102-105)
            multiview_path=(
                osp.join(
                    args.data_root, "scanrefer_2d_feats",
                    "enet_feats_maxpool.hdf5",
                )
                if getattr(args, "use_multiview", False)
                else None
            ),
        )

    def __len__(self) -> int:
        return len(self.annos)

    def _cls_results(self) -> dict:
        """Per-scan predicted object classes for --butd_cls
        (``data/cls_results.json``, joint_det_dataset.py:114-116,960-963).
        Empty dict when the file is absent (GT classes are used instead)."""
        if not hasattr(self, "_cls_results_cache"):
            self._cls_results_cache = load_cls_results(self.detected_dir)
        return self._cls_results_cache

    def _load_multiview(self, scan_id: str) -> np.ndarray:
        """128-d multiview image features per point from the ScanNet
        ``enet_feats_maxpool.hdf5`` store (``joint_det_dataset.py:411-418``)."""
        import h5py

        if not hasattr(self, "_multiview_file"):
            self._multiview_file = h5py.File(self.multiview_path, "r")
        feats = np.asarray(self._multiview_file[scan_id], np.float32)
        n = len(self.scans[scan_id].pc)
        if len(feats) != n:
            # the reference concatenates rows 1:1 against the downsampled
            # cloud (joint_det_dataset.py:487-490): any other count means
            # the store doesn't correspond to these points — padding or
            # truncating would silently misalign every feature
            raise ValueError(
                f"multiview store for {scan_id} has {len(feats)} rows but "
                f"the packed scan keeps {n} points"
            )
        return feats

    def _load_detected(self, scan_id: str):
        return load_detected(self.detected_dir, self.split, scan_id)

    def example(self, idx: int, butd: Optional[bool] = None) -> dict:
        butd = self.butd if butd is None else butd
        anno = self.annos[idx]
        scan = self.scans[anno["scan_id"]]
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + idx) % (2**31)
        )

        xyz = scan.pc.copy()
        color = scan.color - MEAN_RGB if self.use_color else None

        # target (+ first anchor with detect_intermediate,
        # joint_det_dataset.py:688-697)
        tids = [anno["target_id"]]
        if (
            self.detect_intermediate
            and anno.get("anchor_ids")
            and anno.get("decoupled", {}).get("auxi")
        ):
            tids.append(anno["anchor_ids"][0])
        obj_idxs = [scan.object_by_id(t) for t in tids]
        obj_idxs = [o for o in obj_idxs if o is not None]

        point_instance = -np.ones(len(xyz), np.int32)
        for slot, o in enumerate(obj_idxs):
            point_instance[scan.three_d_objects[o]["points"]] = slot

        # augment the CLOUD first; all object boxes are then recomputed from
        # the augmented points exactly like the reference, whose
        # get_object_bbox reads the augmented scan.pc
        # (joint_det_dataset.py:508, 703-705, visual_data_handlers.py:246-259)
        # — tight boxes, not corner-transformed AABBs.
        # height rides the PRE-augmentation cloud: the reference computes it
        # at _get_pc step b, before step d augments scan.pc
        # (joint_det_dataset.py:481-505)
        height = None
        if self.use_height:
            floor = np.percentile(xyz[:, 2], 0.99)
            height = (xyz[:, 2] - floor)[:, None].astype(np.float32)

        aug = None
        if self.augment:
            # dataset-conditional rotation gates (joint_det_dataset.py:
            # 494-505): sr3d keys on the canonical relation, nr3d/scanrefer
            # on the substring rel-word check, scannet always rotates
            dset = anno.get("dataset", "scanrefer")
            if dset.startswith("sr3d"):
                rotate = rotate_sr3d(anno["utterance"])
            else:
                rotate = dset == "scannet" or rotate_natural(anno["utterance"])
            xyz, color, _, aug = augment_scene(
                rng, xyz, color, np.zeros((0, 6), np.float32), rotate
            )

        def obj_box(o: int) -> np.ndarray:
            return object_box_from_points(
                xyz, scan.three_d_objects[o]["points"]
            )

        # scene objects: the reference keeps objects whose label is in the
        # 485-class vocabulary and ids them with DC(485) ranks — the rows of
        # the butd class-embedding table (joint_det_dataset.py:889-900)
        scene_objs = [
            o
            for o in range(min(len(scan.three_d_objects), MAX_NUM_OBJ))
            if instance_label_in_class485(
                scan.three_d_objects[o]["instance_label"]
            )
        ]
        scene_boxes = (
            np.stack([obj_box(o) for o in scene_objs]).astype(np.float32)
            if scene_objs
            else np.zeros((0, 6), np.float32)
        )
        scene_classes = np.array(
            [
                instance_label_to_class485(
                    scan.three_d_objects[o]["instance_label"]
                )
                for o in scene_objs
            ],
            np.int32,
        )

        gt_boxes = np.stack([obj_box(o) for o in obj_idxs])
        if self.augment:
            # box jitter: GT (joint_det_dataset.py:709-710) AND scene boxes
            # (:748-749)
            gt_boxes = gt_boxes * (0.95 + 0.1 * rng.random(gt_boxes.shape))
            scene_boxes = scene_boxes * (
                0.95 + 0.1 * rng.random(scene_boxes.shape)
            ).astype(np.float32)

        # text
        caption = not_mentioned_suffix(anno["utterance"])
        tok = self.tokenizer.encode_batch([caption], max_len=self.text_len)
        maps = build_positive_maps(tok, 0, anno["decoupled"])

        G = MAX_NUM_OBJ
        center_label = np.zeros((G, 3), np.float32)
        size_gts = np.zeros((G, 3), np.float32)
        box_label_mask = np.zeros((G,), np.float32)
        n_t = len(obj_idxs)
        center_label[:n_t] = gt_boxes[:, :3]
        center_label[n_t:] = 1000.0  # joint_det_dataset.py:711
        size_gts[:n_t] = gt_boxes[:, 3:]
        box_label_mask[:n_t] = 1.0

        def tile(key, row=0):
            out = np.zeros((G, MAX_TOKENS), np.float32)
            out[row] = maps[key]
            return out

        # auxi pseudo-box: the scene box of the auxiliary entity's class
        # nearest the target (within sqrt(100) m), reference _get_auxi_boxes
        # (joint_det_dataset.py:756-783). Row 1 of the target map gets the
        # auxi token map ONLY when this resolves AND the dataset is sr3d
        # (:676-677) — not sr3d+, and never as a main-map fallback.
        auxi_box = None
        lemma = anno.get("decoupled", {}).get("auxi_lemma", "")
        if lemma and anno.get("dataset") != "scannet":
            from eda_tpu.data.class_config import dc485, raw_to_tsv_id

            cls_id = dc485().nyu40id2class.get(raw_to_tsv_id().get(lemma))
            if cls_id is not None and len(gt_boxes):
                best_d = 100.0  # the reference's dis_min threshold
                for j, o in enumerate(scene_objs):
                    if o == (obj_idxs[0] if obj_idxs else -1):
                        continue
                    if scene_classes[j] == cls_id:
                        d = float(((gt_boxes[0, :3] - scene_boxes[j, :3]) ** 2).sum())
                        if d < best_d:
                            best_d = d
                            auxi_box = scene_boxes[j]

        positive_map = tile("main")
        if (
            n_t > 1
            and auxi_box is not None
            and anno.get("dataset") == "sr3d"
        ):
            positive_map[1] = maps["auxi"]

        # optional per-point extras (joint_det_dataset.py:481-490)
        extras = []
        if height is not None:
            extras.append(height)
        if self.multiview_path:
            extras.append(self._load_multiview(anno["scan_id"]))

        # Morton presort after augmentation so the fused SA layer consumes
        # spatially sorted clouds without a device-side sort.
        from eda_tpu.data.presort import morton_sort

        arrays = [a for a in (color, point_instance, *extras) if a is not None]
        sorted_all = morton_sort(xyz, *arrays)
        xyz = sorted_all[0]
        rest = list(sorted_all[1:])
        if color is not None:
            color = rest.pop(0)
        point_instance = rest.pop(0)
        extras = rest

        pc = xyz.astype(np.float32)
        if color is not None:
            pc = np.concatenate([pc, color.astype(np.float32)], -1)
        for extra in extras:
            pc = np.concatenate([pc, extra.astype(np.float32)], -1)

        inputs = {
            "point_clouds": pc,
            "text_ids": tok.input_ids[0],
            "text_mask": tok.attention_mask[0],
        }
        if butd:
            det_boxes = np.zeros((MAX_NUM_OBJ, 6), np.float32)
            det_mask = np.zeros((MAX_NUM_OBJ,), bool)
            det_cls = np.zeros((MAX_NUM_OBJ,), np.int32)
            # raw detector class logits, padded to the 485-class vocab like
            # the reference's all_detected_logits
            # (joint_det_dataset.py:42,790,822,1030) — emitted for downstream
            # tooling; nothing in the training graph consumes them
            det_logits = np.zeros((MAX_NUM_OBJ, 485), np.float32)
            detected = None
            if not (self.butd_gt or self.butd_cls):
                detected = self._load_detected(anno["scan_id"])
            if detected is not None:
                boxes, classes, logits = detected
                if aug is not None:
                    # detected boxes ride the same scene transform as the
                    # cloud / GT boxes (joint_det_dataset.py:825-835)
                    boxes = aug.apply_boxes(boxes)
                if self.augment_det and self.augment:
                    boxes, classes = _corrupt_detections(rng, boxes, classes)
                n = min(len(boxes), MAX_NUM_OBJ)
                det_boxes[:n] = boxes[:n]
                det_mask[:n] = True
                det_cls[:n] = classes[:n]
                if logits is not None:
                    k = min(n, len(logits))
                    c = min(logits.shape[1], det_logits.shape[1])
                    det_logits[:k, :c] = logits[:k, :c]
            else:
                # butd_gt / butd_cls oracle substitution
                # (joint_det_dataset.py:951-963); plain butd without
                # GroupFree detections on disk falls back to scene boxes.
                n = len(scene_objs)
                det_boxes[:n] = scene_boxes
                det_mask[:n] = True
                det_cls[:n] = scene_classes
                if self.butd_cls:
                    # butd_cls replaces GT classes with the per-scan
                    # PREDICTED classes from cls_results.json
                    # (joint_det_dataset.py:960-963). The reference fails
                    # loudly on a missing scan or a count mismatch; running
                    # the protocol on GT classes would silently inflate
                    # accuracy, so only a MISSING FILE falls back (warned
                    # once — fixtures/synthetic runs have no such file).
                    results = self._cls_results()
                    if results:
                        cls = np.asarray(results[anno["scan_id"]], np.int32)
                        cls = cls[cls > -1]
                        if len(cls) != n:
                            raise ValueError(
                                f"cls_results.json has {len(cls)} classes "
                                f"for {anno['scan_id']} but the scan keeps "
                                f"{n} objects"
                            )
                        det_cls[:n] = cls
                    elif not getattr(self, "_warned_cls_fallback", False):
                        self._warned_cls_fallback = True
                        import logging

                        logging.getLogger("eda_tpu").warning(
                            "--butd_cls without cls_results.json: falling "
                            "back to GT classes (NOT the reference "
                            "protocol's predicted classes)"
                        )
                # det_logits stay zero — a pinned deviation: the reference's
                # oracle substitution replaces boxes/classes/mask but leaks
                # the GroupFree logits it loaded earlier, misaligned with the
                # substituted boxes (joint_det_dataset.py:951-963; nothing in
                # the training graph consumes them) — see
                # tests/test_reference_parity_getitem.py
            inputs["det_boxes"] = det_boxes
            inputs["det_class_ids"] = det_cls
            inputs["det_mask"] = det_mask
            inputs["det_logits"] = det_logits

        targets = {
            "center_label": center_label,
            "size_gts": size_gts,
            "box_label_mask": box_label_mask,
            "positive_map": positive_map,
            "modify_positive_map": tile("modifiers"),
            "pron_positive_map": tile("pronouns"),
            "other_entity_map": tile("others"),
            "rel_positive_map": tile("relations"),
            "point_instance_label": point_instance,
            "text_lengths": np.int32(tok.lengths[0]),
        }
        hardness = {
            "is_view_dep": is_view_dependent(anno["utterance"]),
            "is_hard": len(anno.get("distractor_ids", [])) > 1,
            "is_unique": len(anno.get("distractor_ids", [])) == 0,
        }
        return {"inputs": inputs, "targets": targets, "hardness": hardness}

    def batch(self, indices, butd: Optional[bool] = None) -> dict:
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
