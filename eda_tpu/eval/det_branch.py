"""ScanNet detection evaluation branch.

Equivalent of ``TrainTester.evaluate_one_epoch_det``
(``train_dist_mod.py:202-327``): run the grounder on the fixed 18-class
detection prompt, project each query's soft-token scores onto the token
spans of the class names (the reference's wordidx/tokenidx tables,
``train_dist_mod.py:248-279``), then class-aware NMS + VOC AP.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from eda_tpu.data.detection_prompt import PROMPT_NAMES
from eda_tpu.eval.detection import (
    APCalculator,
    parse_groundtruths,
    parse_predictions_from_probs,
)
from eda_tpu.models.tokenizer import TokenBatch


def class_token_spans(
    batch: TokenBatch, b: int, caption: str, names: Sequence[str] = PROMPT_NAMES
) -> List[List[int]]:
    """Token indices of each class name inside the detection prompt."""
    padded = " " + caption + " "
    spans: List[List[int]] = []
    for name in names:
        start = padded.find(" " + name + " ")
        toks: List[int] = []
        if start >= 0:
            for offset in range(len(name)):
                t = batch.char_to_token(b, start + offset)
                if t is not None and t not in toks:
                    toks.append(t)
        spans.append(toks)
    return spans


def project_soft_tokens(
    sem_cls_scores: np.ndarray, spans: List[List[int]]
) -> Tuple[np.ndarray, np.ndarray]:
    """Soft-token scores (B, Q, 256) -> (class_probs (B, Q, 18), obj (B, Q)).

    objectness = 1 - P(not mentioned) with 'not mentioned' the final token
    slot (``models/ap_helper.py:146-150``); class prob = summed probability
    over the class-name token positions, renormalized by objectness.
    """
    x = sem_cls_scores - sem_cls_scores.max(-1, keepdims=True)
    probs = np.exp(x)
    probs /= probs.sum(-1, keepdims=True)
    obj = 1.0 - probs[..., -1]
    cls = np.zeros(probs.shape[:2] + (len(spans),), np.float32)
    for c, toks in enumerate(spans):
        if toks:
            cls[..., c] = probs[..., toks].sum(-1)
    cls /= np.maximum(obj[..., None], 1e-9)
    return cls, obj


def evaluate_detection_batch(
    calc: "APCalculator | list[APCalculator]",
    end_points: Dict,
    targets: Dict,
    gt_classes: np.ndarray,
    token_batch: TokenBatch,
    caption: str,
    prefix: str = "last_",
    valid: np.ndarray = None,
):
    """Accumulate one batch into the APCalculator(s).

    ``calc`` may be a single APCalculator or a list (one per IoU threshold,
    like the reference's ap_calculator_list, train_dist_mod.py:234-241 —
    predictions are parsed once and stepped into each).
    ``valid`` (B,) bool marks real rows; padded tail rows (the jit batch is
    fixed-size, the val split usually isn't a multiple of it) are dropped
    before scoring, matching the reference's full-split iteration
    (``train_dist_mod.py:202-327``).
    """
    from eda_tpu.parallel import to_host_global

    # multi-host safe fetch of the (possibly remotely-sharded) jit outputs —
    # see parallel/mesh.py:to_host_global
    sem = to_host_global(end_points[f"{prefix}sem_cls_scores"])
    spans = class_token_spans(token_batch, 0, caption)
    cls_probs, obj = project_soft_tokens(sem, spans)
    preds = parse_predictions_from_probs(
        to_host_global(end_points[f"{prefix}center"]),
        to_host_global(end_points[f"{prefix}pred_size"]),
        cls_probs,
        obj,
    )
    gt_boxes = np.concatenate(
        [np.asarray(targets["center_label"]), np.asarray(targets["size_gts"])],
        -1,
    )
    gts = parse_groundtruths(
        gt_boxes, gt_classes, np.asarray(targets["box_label_mask"]) > 0
    )
    if valid is not None:
        preds = [p for p, v in zip(preds, valid) if v]
        gts = [g for g, v in zip(gts, valid) if v]
    for c in (calc if isinstance(calc, (list, tuple)) else [calc]):
        c.step(preds, gts)
