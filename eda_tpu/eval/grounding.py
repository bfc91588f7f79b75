"""Grounding evaluator: Acc@{0.25,0.5} x Top-{1,5,10} under two scoring modes.

Vectorized re-implementation of the reference ``src/grounding_evaluator.py``:

* ``bbs`` — position alignment: soft-token class scores x decoupled positive
  maps (``grounding_evaluator.py:135-229``);
* ``bbf`` — semantic alignment: 64-d query-token similarities at T = 0.07
  (``grounding_evaluator.py:232-373``);

both combine component scores as ``main + modi + pron + rel - other``
(``:207,:310``), take the top-10 queries per annotated object, and threshold
3D IoU against the GT box. Hardness breakdowns (view-dep / hard / unique)
accumulate on the ``last_`` prefix at top-1 exactly like the reference.

The per-batch math is one jit-compiled call; the evaluator object only
accumulates integer counters on host, so cross-host reduction is a trivial
sum of dicts (replacing the reference's pickle all_gather,
``utils/misc.py:23-66``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eda_tpu.ops.boxes import box_cxcyczwhd_to_xyzxyz, pairwise_box_iou_3d

TEMPERATURE = 0.07


def score_and_iou(end_points: dict, targets: dict, *, prefix: str, mode: str, topk: int = 10):
    """Top-k predicted boxes per sample and their IoU with the root GT box.

    Returns ious (B, topk) for the root (first) annotated object, matching
    the reference's only_root=True grounding configuration. Pure function —
    compose it into a larger jit (see ``train.step.make_eval_score_step``)
    or use the jitted ``_score_and_iou`` wrapper.
    """
    pred_bbox = jnp.concatenate(
        [end_points[f"{prefix}center"], end_points[f"{prefix}pred_size"]], -1
    )  # (B, Q, 6)

    if mode == "bbs":
        sem = jax.nn.softmax(end_points[f"{prefix}sem_cls_scores"], -1)  # (B,Q,C)
    else:  # bbf
        sim = jnp.einsum(
            "bqd,bld->bql",
            end_points[f"{prefix}proj_queries"],
            end_points["proj_tokens"],
        )
        sem = jax.nn.softmax(sim / TEMPERATURE, -1)  # (B, Q, L)
    C = sem.shape[-1]

    def comp(key, binarize=False):
        m = targets[key][:, 0, :C]  # root object row, (B, C)
        if binarize:
            m = (m > 0).astype(sem.dtype)
        return jnp.einsum("bqc,bc->bq", sem, m)

    scores = (
        comp("positive_map", binarize=True)
        + comp("modify_positive_map")
        + comp("pron_positive_map")
        + comp("rel_positive_map")
        - comp("other_entity_map")
    )  # (B, Q)

    if "__det_boxes" in targets:
        # butd_cls protocol: zero the scores of predictions that do not
        # overlap (IoU > 0.25) any valid detected box — the reference's
        # filter_non_gt_boxes branch (grounding_evaluator.py:166-175,210).
        iou_dp, _ = pairwise_box_iou_3d(
            box_cxcyczwhd_to_xyzxyz(targets["__det_boxes"]),
            box_cxcyczwhd_to_xyzxyz(pred_bbox),
        )  # (B, D, Q)
        iou_dp = jnp.where(targets["__det_mask"][:, :, None], iou_dp, 0.0)
        is_correct = (jnp.max(iou_dp, axis=1) > 0.25).astype(scores.dtype)
        scores = scores * is_correct

    k = min(topk, scores.shape[-1])
    _, top = jax.lax.top_k(scores, k)  # (B, k)
    boxes = jnp.take_along_axis(pred_bbox, top[..., None], axis=1)  # (B, k, 6)

    gt_root = jnp.concatenate(
        [targets["center_label"][:, :1, :], targets["size_gts"][:, :1, :]], -1
    )  # (B, 1, 6)
    ious, _ = pairwise_box_iou_3d(
        box_cxcyczwhd_to_xyzxyz(gt_root), box_cxcyczwhd_to_xyzxyz(boxes)
    )  # (B, 1, k)
    ious = ious[:, 0, :]
    if k < topk:  # fewer queries than ranks: pad as misses
        ious = jnp.pad(ious, ((0, 0), (0, topk - k)))
    return ious


_score_and_iou = jax.jit(
    score_and_iou, static_argnames=("mode", "prefix", "topk")
)


def score_and_iou_multi(
    end_points: dict,
    targets: dict,
    *,
    prefixes: Sequence[str],
    modes: Sequence[str],
    topk: int = 10,
):
    """All (prefix, mode) IoU matrices stacked as one (P, M, B, topk) array.

    One array means ONE device->host fetch per eval batch instead of
    P*M dispatch+fetch round-trips — on a tunneled TPU backend each
    round-trip costs ~30 ms, which dominated the measured eval loop
    (188.9 scenes/sec eval vs 283.7 forward, round 4)."""
    return jnp.stack(
        [
            jnp.stack(
                [
                    score_and_iou(
                        end_points, targets, prefix=p, mode=m, topk=topk
                    )
                    for m in modes
                ]
            )
            for p in prefixes
        ]
    )


_score_and_iou_multi = jax.jit(
    score_and_iou_multi, static_argnames=("prefixes", "modes", "topk")
)


class GroundingEvaluator:
    """Accumulates Acc@threshold x top-k counters across batches.

    Same printout keys as the reference (``grounding_evaluator.py:74-100``).
    """

    def __init__(
        self,
        prefixes: Sequence[str] = ("last_", "proposal_"),
        thresholds: Sequence[float] = (0.25, 0.5),
        topks: Sequence[int] = (1, 5, 10),
        modes: Sequence[str] = ("bbs", "bbf"),
        filter_non_gt_boxes: bool = False,
    ):
        self.prefixes = tuple(prefixes)
        self.thresholds = tuple(thresholds)
        self.topks = tuple(topks)
        self.modes = tuple(modes)
        # butd_cls protocol: drop predictions with no detected-box overlap
        # (reference ctor flag, src/grounding_evaluator.py:29-56)
        self.filter_non_gt_boxes = filter_non_gt_boxes
        self.dets: Dict = {}
        self.gts: Dict = {}
        self.reset()

    def reset(self):
        for prefix in self.prefixes:
            for t in self.thresholds:
                for k in self.topks:
                    for mode in self.modes:
                        self.dets[(prefix, t, k, mode)] = 0
                        self.gts[(prefix, t, k, mode)] = 0
        for key in (
            "vd", "vid", "hard", "easy", "unique", "multi",
            "vd50", "vid50", "hard50", "easy50", "unique50", "multi50",
        ):
            self.dets[key] = 0
            self.gts[key] = 0

    def evaluate(
        self,
        end_points: dict,
        targets: dict,
        hardness: Optional[dict] = None,
        valid: Optional[np.ndarray] = None,
        inputs: Optional[dict] = None,
        ious: Optional[np.ndarray] = None,
    ):
        """Accumulate one batch. ``hardness``: optional bool arrays (B,) keyed
        is_view_dep / is_hard / is_unique (``joint_det_dataset.py:1031-1033``).
        ``valid``: optional bool (B,) marking real samples — a padded tail
        batch (full-split eval with a fixed jit batch size) contributes only
        its real rows to the counters. ``inputs``: the model inputs dict;
        needed (det_boxes/det_mask) when ``filter_non_gt_boxes`` is set.
        ``ious``: optionally the precomputed (P, M, B, topk) stack from
        ``score_and_iou_multi`` (ordered like self.prefixes x self.modes,
        e.g. from a fused forward+score step) — skips scoring here entirely
        and ``end_points``/``targets``/``inputs`` may then be None."""
        if ious is None:
            if (
                self.filter_non_gt_boxes
                and inputs is not None
                and "det_boxes" in inputs
            ):
                targets = {
                    **targets,
                    "__det_boxes": inputs["det_boxes"],
                    "__det_mask": inputs["det_mask"],
                }
            from eda_tpu.parallel import to_host_global

            # multi-host safe: under jax.distributed the jit result is a
            # global array with remote shards; to_host_global replicates it
            # so EVERY process counts all rows and the counters come out
            # globally identical (reference all_gathers instead,
            # src/grounding_evaluator.py:102-119). One stacked call = one
            # dispatch + one fetch for all prefix x mode combinations.
            ious = to_host_global(
                _score_and_iou_multi(
                    end_points,
                    targets,
                    prefixes=self.prefixes,
                    modes=self.modes,
                )
            )  # (P, M, B, 10)
        ious = np.asarray(ious)
        for pi, prefix in enumerate(self.prefixes):
            for mi, mode in enumerate(self.modes):
                iou_pm = ious[pi, mi]  # (B, 10)
                B = iou_pm.shape[0]
                vmask = (
                    np.ones(B, bool) if valid is None else np.asarray(valid, bool)
                )
                for t in self.thresholds:
                    hit = iou_pm > t
                    for k in self.topks:
                        found = hit[:, :k].any(1) & vmask
                        self.dets[(prefix, t, k, mode)] += int(found.sum())
                        self.gts[(prefix, t, k, mode)] += int(vmask.sum())
                        if (
                            mode == "bbf"
                            and prefix == "last_"
                            and k == 1
                            and hardness is not None
                        ):
                            suffix = "" if t == self.thresholds[0] else "50"
                            if t in (self.thresholds[0], self.thresholds[1]):
                                self._breakdown(found, hardness, suffix, vmask)

    def _breakdown(
        self, found: np.ndarray, hardness: dict, suffix: str, vmask: np.ndarray
    ):
        for flag, yes, no in (
            ("is_view_dep", "vd", "vid"),
            ("is_hard", "hard", "easy"),
            ("is_unique", "unique", "multi"),
        ):
            mask = np.asarray(hardness[flag]).astype(bool) & vmask
            inv = ~np.asarray(hardness[flag]).astype(bool) & vmask
            self.dets[yes + suffix] += int(found[mask].sum())
            self.gts[yes + suffix] += int(mask.sum())
            self.dets[no + suffix] += int(found[inv].sum())
            self.gts[no + suffix] += int(inv.sum())

    def merge(self, other: "GroundingEvaluator"):
        """Cross-process reduction: plain counter sum."""
        for key in self.dets:
            self.dets[key] += other.dets[key]
            self.gts[key] += other.gts[key]

    def accuracy(self, prefix="last_", threshold=0.25, topk=1, mode="bbf") -> float:
        key = (prefix, threshold, topk, mode)
        return self.dets[key] / max(self.gts[key], 1)

    def print_stats(self) -> str:
        """Reference-style accuracy table (grounding_evaluator.py:74-100)."""
        mode_str = {"bbs": "Box given span (soft-token)", "bbf": "Box given span (contrastive)"}
        lines = []
        for prefix in self.prefixes:
            for mode in self.modes:
                line = f"{prefix} {mode_str[mode]} "
                for t in self.thresholds:
                    for k in self.topks:
                        acc = self.accuracy(prefix, t, k, mode)
                        line += f"Acc{t}Top{k}: {acc:.4f} "
                lines.append(line)
        for key in ("vd", "vid", "hard", "easy", "unique", "multi"):
            if self.gts[key]:
                lines.append(
                    f"{key}: {self.dets[key] / max(self.gts[key], 1):.4f} "
                    f"({self.dets[key]}/{self.gts[key]})"
                )
        return "\n".join(lines)
