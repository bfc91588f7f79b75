"""Differential parity tests for the detection-eval stack and LR schedules
against the ACTUAL reference code under /root/reference.

Complements ``test_reference_parity.py`` (losses / encoder-decoder layers /
grounding evaluator): here the oracles are the reference's own
``utils/nms.py``, ``utils/box_util.py``, ``utils/eval_det.py``,
``models/ap_helper.py`` and ``utils/lr_scheduler.py`` — all import cleanly
on CPU torch with an ``ipdb`` stub — run on identical fabricated inputs.

Axis conventions: the reference evaluates boxes in the "upright camera"
frame (y vertical, BEV on x/z; ``ap_helper.py:flip_axis_to_camera``), ours
stays in the depth frame (z vertical, BEV on x/y). The two are related by
(x, y, z)_depth -> (x, -z, y)_camera; axis-aligned IoU and greedy NMS are
invariant under that reflection, and the oriented-box tests map
depth-frame (center, heading) to camera-frame (x, z, y) with negated
heading (rotation about the vertical flips chirality with the axis swap).
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _utils_pkg():
    pkg = sys.modules.get("utils")
    if pkg is None:
        pkg = types.ModuleType("utils")
        pkg.__spec__ = importlib.machinery.ModuleSpec("utils", loader=None)
        pkg.__path__ = []
        sys.modules["utils"] = pkg
    if "ipdb" not in sys.modules:
        ipdb = types.ModuleType("ipdb")
        ipdb.__spec__ = importlib.machinery.ModuleSpec("ipdb", loader=None)
        ipdb.set_trace = lambda *a, **k: None
        sys.modules["ipdb"] = ipdb
    return pkg


@pytest.fixture(scope="module")
def ref_nms():
    pkg = _utils_pkg()
    mod = _load("utils.nms", f"{REF}/utils/nms.py")
    pkg.nms = mod
    return mod


@pytest.fixture(scope="module")
def ref_box_util():
    pkg = _utils_pkg()
    mod = _load("utils.box_util", f"{REF}/utils/box_util.py")
    pkg.box_util = mod
    return mod


@pytest.fixture(scope="module")
def ref_eval_det():
    pkg = _utils_pkg()
    # eval_det.py does `from metric_util import calc_iou` / `from box_util
    # import box3d_iou` as top-level names (it assumes cwd == utils/);
    # pre-register them under those names
    if "metric_util" not in sys.modules:
        _load("metric_util", f"{REF}/utils/metric_util.py")
    if "box_util" not in sys.modules:
        _load("box_util", f"{REF}/utils/box_util.py")
    mod = _load("utils.eval_det", f"{REF}/utils/eval_det.py")
    pkg.eval_det = mod
    return mod


@pytest.fixture(scope="module")
def ref_ap(ref_nms, ref_box_util, ref_eval_det):
    return _load("_ref_ap_helper", f"{REF}/models/ap_helper.py")


@pytest.fixture(scope="module")
def ref_lr():
    return _load("_ref_lr_scheduler", f"{REF}/utils/lr_scheduler.py")


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------


def _random_boxes(rng, n):
    lo = rng.uniform(0.0, 4.0, (n, 3))
    size = rng.uniform(0.2, 2.0, (n, 3))
    return np.concatenate([lo, lo + size], -1)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thresh", [0.1, 0.25, 0.5])
def test_nms_3d_samecls_parity(ref_nms, seed, thresh):
    """Kept indices (in pick order) match ``nms_3d_faster_samecls``
    (utils/nms.py:120-163) on random boxes/scores/classes."""
    from eda_tpu.eval.nms import nms_3d

    rng = np.random.default_rng(seed)
    n = 80
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0.01, 1.0, n)
    classes = rng.integers(0, 4, n)
    arr = np.concatenate(
        [boxes, scores[:, None], classes[:, None].astype(float)], -1
    )
    ref_pick = ref_nms.nms_3d_faster_samecls(arr, thresh)
    ours = nms_3d(boxes, scores, thresh, classes=classes)
    assert list(ref_pick) == ours.tolist()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_3d_plain_parity(ref_nms, seed):
    """Class-agnostic variant matches ``nms_3d_faster`` (utils/nms.py:78-117)."""
    from eda_tpu.eval.nms import nms_3d

    rng = np.random.default_rng(100 + seed)
    boxes = _random_boxes(rng, 60)
    scores = rng.uniform(0.01, 1.0, 60)
    arr = np.concatenate([boxes, scores[:, None]], -1)
    ref_pick = ref_nms.nms_3d_faster(arr, 0.25)
    ours = nms_3d(boxes, scores, 0.25)
    assert list(ref_pick) == ours.tolist()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("old_type", [False, True])
def test_nms_2d_parity(ref_nms, seed, old_type):
    """2D variant matches ``nms_2d_faster`` (utils/nms.py:44-84) under both
    overlap normalizations (true IoU and the legacy candidate-area mode)."""
    from eda_tpu.eval.nms import nms_2d

    rng = np.random.default_rng(200 + seed)
    n = 60
    lo = rng.uniform(0.0, 4.0, (n, 2))
    size = rng.uniform(0.2, 2.0, (n, 2))
    boxes = np.concatenate([lo, lo + size], -1)
    scores = rng.uniform(0.01, 1.0, n)
    arr = np.concatenate([boxes, scores[:, None]], -1)
    ref_pick = ref_nms.nms_2d_faster(arr, 0.25, old_type=old_type)
    ours = nms_2d(boxes, scores, 0.25, old_type=old_type)
    assert list(ref_pick) == ours.tolist()


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("ovthresh", [0.25, 0.5])
def test_grounding_giou_accuracy_parity(ref_eval_det, seed, ovthresh):
    """``APCalculator.compute_accuracy`` matches ``eval_grounding``
    (utils/eval_det.py:364-413): stable score-descending sort, GIoU of the
    top-{1,5,10} boxes vs the FIRST GT box, per-scan hit averaging. Every
    scan here has >=1 GT and >=1 prediction (the reference crashes on
    empties; ours counts no-pred scans as misses — pinned deviation)."""
    from eda_tpu.eval.detection import APCalculator

    rng = np.random.default_rng(300 + seed)
    n_scans = 12
    pred_all, gt_all = {}, {}
    calc = APCalculator(iou_thresh=ovthresh)
    for sid in range(n_scans):
        n_pred = int(rng.integers(1, 14))
        boxes = _random_boxes(rng, n_pred)
        scores = np.round(rng.uniform(0.0, 1.0, n_pred), 2)  # force ties
        gts = _random_boxes(rng, int(rng.integers(1, 4)))
        # reference consumes raw corner sets; (2, 3) [lo, hi] min/max-reduces
        # to the same ends through corners_to_ends (eval_det.py:81-84)
        pred_all[sid] = [
            (0, b.reshape(2, 3), float(s)) for b, s in zip(boxes, scores)
        ]
        gt_all[sid] = [(0, g.reshape(2, 3)) for g in gts]
        calc.step(
            [[(0, b, float(s)) for b, s in zip(boxes, scores)]],
            [[(0, g) for g in gts]],
        )
    ref = ref_eval_det.eval_grounding(pred_all, gt_all, ovthresh=ovthresh)
    ours = calc.compute_accuracy(ovthresh)
    for k in (1, 5, 10):
        assert ours[k] == pytest.approx(ref[k]), (k, ours, ref)


# ---------------------------------------------------------------------------
# Oriented box IoU (box_util.py)
# ---------------------------------------------------------------------------


def _cam(center):
    """Depth-frame center -> camera-frame center for our convention map
    (x, y, z)_depth -> (x, z, y)_cam-with-y-vertical (see module docstring:
    we use the chirality-flipped map so corners need no reordering)."""
    cx, cy, cz = center
    return np.array([cx, cz, cy])


@pytest.mark.parametrize("seed", list(range(8)))
def test_box3d_iou_parity(ref_box_util, seed):
    """Oriented 3D/BEV IoU matches ``box_util.box3d_iou`` (:100-126) on
    random oriented box pairs, including the get_3d_box corner expansion
    (:221-237)."""
    from eda_tpu.ops.oriented_boxes import box3d_iou, get_3d_box

    rng = np.random.default_rng(seed)
    hits = 0
    for _ in range(25):
        size1, size2 = rng.uniform(0.4, 2.0, (2, 3))
        c1, c2 = rng.uniform(0.0, 1.5, (2, 3))
        t1, t2 = rng.uniform(-np.pi, np.pi, 2)
        ours1 = get_3d_box(size1, t1, c1)
        ours2 = get_3d_box(size2, t2, c2)
        iou_ours, bev_ours = box3d_iou(ours1, ours2)
        # camera frame: vertical is y, heading about y with flipped sign
        ref1 = ref_box_util.get_3d_box(size1, -t1, _cam(c1))
        ref2 = ref_box_util.get_3d_box(size2, -t2, _cam(c2))
        iou_ref, bev_ref = ref_box_util.box3d_iou(ref1, ref2)
        assert iou_ours == pytest.approx(iou_ref, abs=2e-6)
        assert bev_ours == pytest.approx(bev_ref, abs=2e-6)
        hits += iou_ref > 0
    assert hits >= 5  # the sample actually exercises overlapping pairs


def test_get_iou_obb_axis_aligned_matches_corner_iou(ref_eval_det):
    """``get_iou_obb`` (eval_det.py:153-155) at heading 0 equals our
    axis-aligned corner IoU — pins that dropping the oriented path for the
    heading-0 pipeline is exact."""
    from eda_tpu.eval.detection import _center_size_to_corners, _iou_corner
    from eda_tpu.ops.oriented_boxes import get_3d_box

    rng = np.random.default_rng(7)
    for _ in range(25):
        c1, c2 = rng.uniform(0, 1.5, (2, 3))
        s1, s2 = rng.uniform(0.3, 2.0, (2, 3))
        ours = _iou_corner(
            _center_size_to_corners(np.concatenate([c1, s1])),
            _center_size_to_corners(np.concatenate([c2, s2])),
        )
        # get_iou_obb expects camera-frame corners (y vertical): apply the
        # (x, y, z)_depth -> (x, z, y) swap to our depth-frame corners
        ref = ref_eval_det.get_iou_obb(
            get_3d_box(s1, 0.0, c1)[:, [0, 2, 1]],
            get_3d_box(s2, 0.0, c2)[:, [0, 2, 1]],
        )
        assert ours == pytest.approx(float(ref), abs=1e-6)


# ---------------------------------------------------------------------------
# VOC AP + full eval_det pipeline
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_voc_ap_parity(ref_eval_det, seed):
    from eda_tpu.eval.detection import voc_ap

    rng = np.random.default_rng(seed)
    n = rng.integers(3, 40)
    rec = np.sort(rng.uniform(0, 1, n))
    prec = rng.uniform(0, 1, n)
    assert voc_ap(rec, prec) == pytest.approx(
        float(ref_eval_det.voc_ap(rec, prec, use_07_metric=False)), abs=1e-12
    )


def _fabricate_detections(rng, num_scans=6, num_classes=3):
    """Random per-scan GT and predictions, incl. a pred-only class."""
    gts, preds = [], []
    for _ in range(num_scans):
        ng = int(rng.integers(1, 5))
        gt_boxes = _random_boxes(rng, ng)
        gt_cls = rng.integers(0, num_classes, ng)
        scan_gt = [(int(c), b) for c, b in zip(gt_cls, gt_boxes)]
        npred = int(rng.integers(2, 9))
        # half the predictions hug a GT box, half are noise
        pb = []
        for j in range(npred):
            if j < ng and rng.uniform() < 0.6:
                box = gt_boxes[j] + rng.normal(0, 0.08, 6)
            else:
                box = _random_boxes(rng, 1)[0]
            cls = int(rng.integers(0, num_classes + 1))  # num_classes = pred-only
            pb.append((cls, box, float(rng.uniform(0.05, 1.0))))
        gts.append(scan_gt)
        preds.append(pb)
    # every class gets >= 1 prediction somewhere: the reference's eval_det
    # KeyErrors on GT-only classes (unreachable with per-class proposals)
    for cls in range(num_classes + 1):
        preds[0].append(
            (cls, _random_boxes(rng, 1)[0], float(rng.uniform(0.05, 1.0)))
        )
    return preds, gts


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thresh", [0.25, 0.5])
def test_eval_det_parity(ref_eval_det, ref_box_util, seed, thresh):
    """Per-class AP / recall and the mAP mean match the reference
    ``eval_det`` (utils/eval_det.py:263-306) run with its own
    ``get_iou_obb`` on the same fabricated detections."""
    from eda_tpu.eval.detection import APCalculator

    rng = np.random.default_rng(40 + seed)
    preds, gts = _fabricate_detections(rng)

    calc = APCalculator(iou_thresh=thresh)
    calc.step(preds, gts)
    ours = calc.compute_metrics()

    def corners8(box6):
        size = box6[3:] - box6[:3]
        center = (box6[:3] + box6[3:]) / 2
        return ref_box_util.get_3d_box(size, 0.0, _cam(center))

    pred_all = {
        sid: [(c, corners8(b), s) for c, b, s in pb]
        for sid, pb in enumerate(preds)
    }
    gt_all = {
        sid: [(c, corners8(b)) for c, b in gb] for sid, gb in enumerate(gts)
    }
    rec, _prec, ap = ref_eval_det.eval_det(
        pred_all, gt_all, ovthresh=thresh,
        get_iou_func=ref_eval_det.get_iou_obb,
    )
    assert set(ap.keys()) == {
        int(k.split("_")[1]) for k in ours if k.startswith("ap_")
    }
    for c, ref_ap_c in ap.items():
        assert ours[f"ap_{c}"] == pytest.approx(float(ref_ap_c), abs=1e-6), c
        ref_rec = float(rec[c][-1]) if len(rec[c]) else 0.0
        assert ours[f"recall_{c}"] == pytest.approx(ref_rec, abs=1e-6), c
    assert ours["mAP"] == pytest.approx(
        float(np.mean(list(ap.values()))), abs=1e-6
    )


# ---------------------------------------------------------------------------
# parse_predictions / parse_groundtruths (ap_helper.py)
# ---------------------------------------------------------------------------


class _DC:
    """dataset_config stub: the cls_nms + size_cls_agnostic path only reads
    ``num_class`` (ap_helper.py:218)."""

    def __init__(self, num_class):
        self.num_class = num_class


def _aabb_from_cam_corners(ref_ap, corners8):
    """Reference camera-frame (8,3) corners -> depth-frame (6,) AABB."""
    depth = ref_ap.flip_axis_to_depth(corners8)
    return np.concatenate([depth.min(0), depth.max(0)])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parse_predictions_parity(ref_ap, seed):
    """Full hungarian-path parse parity vs ``ap_helper.parse_predictions``
    (:71-236) with the det-eval CONFIG_DICT (train_dist_mod.py:214-223):
    use_3d_nms + cls_nms + per_class_proposal, objectness from
    1 - P(not mentioned), size_cls_agnostic."""
    from eda_tpu.eval.detection import parse_predictions

    rng = np.random.default_rng(200 + seed)
    B, Q, C = 2, 24, 5
    center = rng.uniform(0, 3, (B, Q, 3)).astype(np.float32)
    size = rng.uniform(0.2, 1.5, (B, Q, 3)).astype(np.float32)
    scores = rng.normal(0, 1.5, (B, Q, C + 1)).astype(np.float32)

    ours = parse_predictions(center, size, scores, nms_iou=0.25)

    end_points = {
        "last_center": torch.from_numpy(center),
        "last_pred_size": torch.from_numpy(size),
        "last_sem_cls_scores": torch.from_numpy(scores),
    }
    config = {
        "remove_empty_box": False, "use_3d_nms": True, "nms_iou": 0.25,
        "use_old_type_nms": False, "cls_nms": True,
        "per_class_proposal": True, "conf_thresh": 0.0,
        "dataset_config": _DC(C), "hungarian_loss": True,
    }
    ref = ref_ap.parse_predictions(
        end_points, config, prefix="last_", size_cls_agnostic=True
    )

    for b in range(B):
        assert len(ours[b]) == len(ref[b])
        ours_sorted = sorted(ours[b], key=lambda d: (d[0], -d[2]))
        ref_sorted = sorted(ref[b], key=lambda d: (d[0], -d[2]))
        for (c_o, box_o, s_o), (c_r, corners_r, s_r) in zip(
            ours_sorted, ref_sorted
        ):
            assert c_o == c_r
            assert s_o == pytest.approx(float(s_r), rel=1e-5)
            np.testing.assert_allclose(
                box_o, _aabb_from_cam_corners(ref_ap, corners_r), atol=1e-5
            )


def test_parse_groundtruths_parity(ref_ap):
    from eda_tpu.eval.detection import parse_groundtruths

    rng = np.random.default_rng(11)
    B, G = 3, 7
    center = rng.uniform(0, 3, (B, G, 3)).astype(np.float32)
    size = rng.uniform(0.2, 1.5, (B, G, 3)).astype(np.float32)
    cls = rng.integers(0, 5, (B, G))
    mask = (rng.uniform(size=(B, G)) < 0.7).astype(np.float32)
    mask[:, 0] = 1.0

    ours = parse_groundtruths(
        np.concatenate([center, size], -1), cls, mask.astype(bool)
    )
    end_points = {
        "center_label": torch.from_numpy(center),
        "size_gts": torch.from_numpy(size),
        "sem_cls_label": torch.from_numpy(cls),
        "box_label_mask": torch.from_numpy(mask),
    }
    ref = ref_ap.parse_groundtruths(
        end_points, {"dataset_config": _DC(5)}, size_cls_agnostic=True
    )
    for b in range(B):
        assert len(ours[b]) == len(ref[b])
        for (c_o, box_o), (c_r, corners_r) in zip(ours[b], ref[b]):
            assert c_o == c_r
            np.testing.assert_allclose(
                box_o, _aabb_from_cam_corners(ref_ap, corners_r), atol=1e-5
            )


# ---------------------------------------------------------------------------
# LR schedules (utils/lr_scheduler.py)
# ---------------------------------------------------------------------------


def _ref_lr_curve(ref_lr, kind, iters, total, **flags):
    args = types.SimpleNamespace(
        lr_scheduler=kind,
        max_epoch=flags["max_epoch"],
        warmup_epoch=flags.get("warmup_epoch", -1),
        warmup_multiplier=flags.get("warmup_multiplier", 100),
        lr_decay_epochs=list(flags.get("lr_decay_epochs", (50, 75))),
        lr_decay_rate=flags.get("lr_decay_rate", 0.1),
    )
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=flags["lr"])
    sched = ref_lr.get_scheduler(opt, iters, args)
    lrs = []
    for _ in range(total):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()  # silence the torch step-order warning
        sched.step()
    return np.asarray(lrs)


@pytest.mark.parametrize(
    "kind,flags",
    [
        ("multistep", dict(lr=2e-4, max_epoch=12, lr_decay_epochs=(5, 8))),
        (
            "multistep",
            dict(
                lr=2e-4, max_epoch=12, lr_decay_epochs=(5, 8),
                warmup_epoch=2, warmup_multiplier=100,
            ),
        ),
        ("cosine", dict(lr=1e-3, max_epoch=10)),
        (
            "cosine",
            dict(lr=1e-3, max_epoch=10, warmup_epoch=3, warmup_multiplier=50),
        ),
    ],
)
def test_lr_schedule_parity(ref_lr, kind, flags):
    """Per-iteration LR matches the reference's actual torch schedulers
    (MultiStepLR / CosineAnnealingLR under GradualWarmupScheduler,
    utils/lr_scheduler.py:11-92) over the full training horizon, including
    the raw ``warmup_epoch=-1`` milestone offset."""
    from eda_tpu.config import TrainConfig
    from eda_tpu.train.optim import make_lr_schedules

    iters = 7
    total = flags["max_epoch"] * iters
    ref_curve = _ref_lr_curve(ref_lr, kind, iters, total, **flags)

    cfg = TrainConfig(
        lr=flags["lr"],
        lr_scheduler=kind,
        max_epoch=flags["max_epoch"],
        lr_decay_epochs=tuple(flags.get("lr_decay_epochs", (50, 75))),
        lr_decay_rate=flags.get("lr_decay_rate", 0.1),
        warmup_epoch=flags.get("warmup_epoch", -1),
        warmup_multiplier=flags.get("warmup_multiplier", 100),
    )
    sched = make_lr_schedules(cfg, steps_per_epoch=iters)["main"]
    ours = np.asarray([float(sched(t)) for t in range(total)])
    np.testing.assert_allclose(ours, ref_curve, rtol=1e-5, atol=1e-9)
