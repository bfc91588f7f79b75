"""Evaluator tests: grounding accuracy accounting, NMS, detection AP."""

import numpy as np
import jax.numpy as jnp
import pytest

from eda_tpu.eval import GroundingEvaluator
from eda_tpu.eval.detection import (
    APCalculator,
    parse_groundtruths,
    parse_predictions,
    voc_ap,
)
from eda_tpu.eval.nms import nms_3d

B, Q, C, L, G = 2, 8, 16, 16, 4


def make_eval_case(rng, perfect=True):
    """Fabricate end_points where the highest-scoring query box either hits
    (perfect) or misses the GT box."""
    gt_center = rng.uniform(-1, 1, (B, G, 3)).astype(np.float32)
    gt_size = rng.uniform(0.4, 0.8, (B, G, 3)).astype(np.float32)

    centers = rng.uniform(5, 6, (B, Q, 3)).astype(np.float32)  # all far away
    sizes = rng.uniform(0.4, 0.8, (B, Q, 3)).astype(np.float32)
    sem = np.full((B, Q, C), -5.0, np.float32)
    pm = np.zeros((B, G, 256), np.float32)
    pm[:, :, 2] = 1.0  # main token at position 2
    if perfect:
        # query 3 matches GT 0 exactly and scores highest on token 2
        centers[:, 3] = gt_center[:, 0]
        sizes[:, 3] = gt_size[:, 0]
        sem[:, 3, 2] = 10.0

    proj_tokens = rng.normal(size=(B, L, 8)).astype(np.float32)
    proj_tokens /= np.linalg.norm(proj_tokens, axis=-1, keepdims=True)
    proj_queries = rng.normal(size=(B, Q, 8)).astype(np.float32)
    proj_queries /= np.linalg.norm(proj_queries, axis=-1, keepdims=True)
    if perfect:
        proj_queries[:, 3] = proj_tokens[:, 2]  # aligned with token 2

    end_points = {
        "last_center": jnp.asarray(centers),
        "last_pred_size": jnp.asarray(sizes),
        "last_sem_cls_scores": jnp.asarray(sem),
        "last_proj_queries": jnp.asarray(proj_queries),
        "proj_tokens": jnp.asarray(proj_tokens),
    }
    targets = {
        "center_label": jnp.asarray(gt_center),
        "size_gts": jnp.asarray(gt_size),
        "box_label_mask": jnp.asarray(np.ones((B, G), np.float32)),
        "positive_map": jnp.asarray(pm),
        "modify_positive_map": jnp.zeros((B, G, 256)),
        "pron_positive_map": jnp.zeros((B, G, 256)),
        "other_entity_map": jnp.zeros((B, G, 256)),
        "rel_positive_map": jnp.zeros((B, G, 256)),
    }
    return end_points, targets


def test_grounding_evaluator_perfect_predictions(rng):
    end_points, targets = make_eval_case(rng, perfect=True)
    ev = GroundingEvaluator(prefixes=("last_",))
    hardness = {
        "is_view_dep": np.array([True, False]),
        "is_hard": np.zeros(B, bool),
        "is_unique": np.ones(B, bool),
    }
    ev.evaluate(end_points, targets, hardness)
    assert ev.accuracy("last_", 0.25, 1, "bbs") == 1.0
    assert ev.accuracy("last_", 0.5, 1, "bbs") == 1.0
    assert ev.accuracy("last_", 0.25, 1, "bbf") == 1.0
    # breakdowns counted on bbf last_ top-1
    assert ev.gts["vd"] == 1 and ev.gts["vid"] == 1
    assert ev.dets["vd"] == 1 and ev.dets["vid"] == 1
    assert ev.dets["unique"] == 2


def test_grounding_evaluator_bad_predictions(rng):
    end_points, targets = make_eval_case(rng, perfect=False)
    ev = GroundingEvaluator(prefixes=("last_",))
    ev.evaluate(end_points, targets)
    assert ev.accuracy("last_", 0.25, 1, "bbs") == 0.0
    assert ev.accuracy("last_", 0.25, 10, "bbs") == 0.0


def test_butd_cls_filter_flips_hit_to_miss(rng):
    """filter_non_gt_boxes (SR3D/NR3D protocol): a top-1 hit whose predicted
    box overlaps no detected box is zeroed out of the ranking
    (grounding_evaluator.py:166-175)."""
    end_points, targets = make_eval_case(rng, perfect=True)
    # detected boxes cover only a far-away corner: no pred overlaps them
    det_boxes = np.zeros((B, 4, 6), np.float32)
    det_boxes[:, :, :3] = -50.0
    det_boxes[:, :, 3:] = 0.5
    det_mask = np.ones((B, 4), bool)
    inputs = {"det_boxes": jnp.asarray(det_boxes), "det_mask": jnp.asarray(det_mask)}

    ev = GroundingEvaluator(prefixes=("last_",), filter_non_gt_boxes=True)
    ev.evaluate(end_points, targets, inputs=inputs)
    # the correct query is filtered: its score collapses to 0, ties with the
    # other filtered queries, and the GT box is no longer guaranteed top-1
    assert ev.accuracy("last_", 0.5, 1, "bbs") == 0.0

    # with a detected box covering the GT, the hit survives the filter
    det_boxes2 = det_boxes.copy()
    det_boxes2[:, 0, :3] = np.asarray(targets["center_label"])[:, 0]
    det_boxes2[:, 0, 3:] = np.asarray(targets["size_gts"])[:, 0]
    ev2 = GroundingEvaluator(prefixes=("last_",), filter_non_gt_boxes=True)
    ev2.evaluate(
        end_points, targets,
        inputs={"det_boxes": jnp.asarray(det_boxes2), "det_mask": jnp.asarray(det_mask)},
    )
    assert ev2.accuracy("last_", 0.25, 1, "bbs") == 1.0

    # without the flag, inputs are ignored and the hit counts
    ev3 = GroundingEvaluator(prefixes=("last_",))
    ev3.evaluate(end_points, targets, inputs=inputs)
    assert ev3.accuracy("last_", 0.25, 1, "bbs") == 1.0


def test_fused_multi_scoring_matches_per_call(rng):
    """The stacked (P, M, B, 10) scorer the evaluator now uses — and its
    precomputed ``ious=`` entry point — must count exactly like per-(prefix,
    mode) ``_score_and_iou`` calls did."""
    from eda_tpu.eval.grounding import _score_and_iou

    end_points, targets = make_eval_case(rng, perfect=True)
    hardness = {
        "is_view_dep": np.array([True, False]),
        "is_hard": np.zeros(B, bool),
        "is_unique": np.ones(B, bool),
    }
    ev = GroundingEvaluator(prefixes=("last_",))
    ev.evaluate(end_points, targets, hardness)

    stacked = np.stack(
        [
            np.stack(
                [
                    np.asarray(
                        _score_and_iou(end_points, targets, prefix=p, mode=m)
                    )
                    for m in ev.modes
                ]
            )
            for p in ev.prefixes
        ]
    )
    ev_pre = GroundingEvaluator(prefixes=("last_",))
    ev_pre.evaluate(None, None, hardness, ious=stacked)
    assert ev_pre.dets == ev.dets
    assert ev_pre.gts == ev.gts


def test_fused_scoring_applies_butd_cls_filter(rng):
    """make_eval_score_step-style target injection (``__det_boxes``) through
    the stacked scorer matches the evaluator's own filter branch."""
    from eda_tpu.eval.grounding import _score_and_iou_multi

    end_points, targets = make_eval_case(rng, perfect=True)
    det_boxes = np.zeros((B, 4, 6), np.float32)
    det_boxes[:, :, :3] = -50.0
    det_boxes[:, :, 3:] = 0.5
    det_mask = np.ones((B, 4), bool)
    inputs = {"det_boxes": jnp.asarray(det_boxes), "det_mask": jnp.asarray(det_mask)}

    ev = GroundingEvaluator(prefixes=("last_",), filter_non_gt_boxes=True)
    ev.evaluate(end_points, targets, inputs=inputs)

    stacked = np.asarray(
        _score_and_iou_multi(
            end_points,
            {**targets, "__det_boxes": inputs["det_boxes"],
             "__det_mask": inputs["det_mask"]},
            prefixes=ev.prefixes,
            modes=ev.modes,
        )
    )
    ev_pre = GroundingEvaluator(prefixes=("last_",), filter_non_gt_boxes=True)
    ev_pre.evaluate(None, None, ious=stacked)
    assert ev_pre.dets == ev.dets
    assert ev_pre.gts == ev.gts


def test_grounding_evaluator_merge(rng):
    e1, t1 = make_eval_case(rng, perfect=True)
    ev1 = GroundingEvaluator(prefixes=("last_",))
    ev1.evaluate(e1, t1)
    ev2 = GroundingEvaluator(prefixes=("last_",))
    ev2.evaluate(e1, t1)
    ev1.merge(ev2)
    assert ev1.gts[("last_", 0.25, 1, "bbs")] == 2 * B
    assert ev1.accuracy("last_", 0.25, 1, "bbs") == 1.0


def test_nms_suppresses_overlaps():
    boxes = np.array(
        [
            [0, 0, 0, 1, 1, 1],
            [0.05, 0.05, 0.05, 1.05, 1.05, 1.05],  # overlaps box 0
            [5, 5, 5, 6, 6, 6],
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_3d(boxes, scores, 0.5)
    assert set(keep.tolist()) == {0, 2}

    # class-aware: overlapping boxes of different classes both survive
    keep = nms_3d(boxes, scores, 0.5, classes=np.array([0, 1, 0]))
    assert set(keep.tolist()) == {0, 1, 2}


def test_voc_ap_perfect_and_zero():
    assert voc_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    assert voc_ap(np.array([0.5]), np.array([1.0])) == pytest.approx(0.5)


def test_ap_calculator_perfect_detection(rng):
    gt_boxes = rng.uniform(0, 1, (1, 3, 6)).astype(np.float32)
    gt_boxes[..., 3:] += 0.3
    gt_classes = np.array([[0, 1, 2]])
    gt_mask = np.ones((1, 3), bool)

    centers = gt_boxes[..., :3]
    sizes = gt_boxes[..., 3:]
    # logits: one-hot per GT class + low 'not mentioned' last column
    sem = np.full((1, 3, 5), -10.0, np.float32)
    for i in range(3):
        sem[0, i, gt_classes[0, i]] = 10.0

    preds = parse_predictions(centers, sizes, sem, nms_iou=0.25, num_classes=4)
    gts = parse_groundtruths(gt_boxes, gt_classes, gt_mask)
    calc = APCalculator(iou_thresh=0.25)
    calc.step(preds, gts)
    metrics = calc.compute_metrics()
    # per-class proposals emit detections for ALL 4 classes; class 3 has no
    # GT, scores AP 0, and still enters the mAP mean (reference semantics,
    # utils/eval_det.py:277-286 + ap_helper.py:341) -> mAP = 3/4
    assert metrics["mAP"] == pytest.approx(0.75, abs=1e-6)
    assert metrics["ap_0"] == pytest.approx(1.0, abs=1e-6)
    assert metrics["recall_0"] == pytest.approx(1.0, abs=1e-6)


def test_ap_calculator_false_positives(rng):
    gt_boxes = np.array([[[0, 0, 0, 1, 1, 1.0]]], np.float32)
    gt_classes = np.array([[0]])
    gt_mask = np.ones((1, 1), bool)
    # two predictions of class 0: one perfect, one far off with lower score
    centers = np.array([[[0, 0, 0], [5, 5, 5.0]]], np.float32)
    sizes = np.ones((1, 2, 3), np.float32)
    sem = np.full((1, 2, 3), -10.0, np.float32)
    sem[0, :, 0] = [10.0, 8.0]
    preds = parse_predictions(centers, sizes, sem, nms_iou=0.25, num_classes=2)
    gts = parse_groundtruths(gt_boxes, gt_classes, gt_mask)
    calc = APCalculator(0.25)
    calc.step(preds, gts)
    m = calc.compute_metrics()
    # AP = 1.0: the true positive ranks first
    assert m["ap_0"] == pytest.approx(1.0, abs=1e-6)
