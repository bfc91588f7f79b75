"""Optimizer with the reference's three parameter groups + LR schedules.

Reference ``main_utils.py:276-305``: AdamW over {main params at --lr,
``backbone_net`` params at --lr_backbone, ``text_encoder`` params at
--text_encoder_lr (frozen in practice)}, weight decay 5e-4, per-iteration
MultiStepLR or CosineAnnealing (``utils/lr_scheduler.py:11-92``), optional
warmup, global-norm gradient clip 0.1 (``main_utils.py:500-508``).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import optax

from eda_tpu.config import TrainConfig


def _group_of(path) -> str:
    top = path[0].key if hasattr(path[0], "key") else str(path[0])
    if top == "backbone_net":
        return "backbone"
    if top == "text_encoder":
        return "text"
    return "main"


def param_labels(params) -> Dict:
    """Label each parameter leaf with its optimizer group."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _group_of(path), params
    )


def make_lr_schedules(cfg: TrainConfig, steps_per_epoch: int):
    """Per-group LR schedules (per-iteration stepping, lr_scheduler.py:24-34)."""

    def schedule(base_lr: float) -> Callable:
        if cfg.lr_scheduler == "cosine":
            main = optax.cosine_decay_schedule(
                base_lr, decay_steps=max(1, cfg.max_epoch * steps_per_epoch)
            )
        else:
            boundaries = {
                e * steps_per_epoch: cfg.lr_decay_rate for e in cfg.lr_decay_epochs
            }
            main = optax.piecewise_constant_schedule(base_lr, boundaries)
        if cfg.warmup_epoch <= 0:
            return main
        warm_steps = cfg.warmup_epoch * steps_per_epoch
        warm = optax.linear_schedule(
            base_lr / cfg.warmup_multiplier, base_lr, warm_steps
        )
        return optax.join_schedules([warm, main], [warm_steps])

    return {
        "main": schedule(cfg.lr),
        "backbone": schedule(cfg.lr_backbone),
        "text": schedule(cfg.text_lr),
    }


def make_optimizer(
    cfg: TrainConfig,
    params,
    steps_per_epoch: int,
    freeze_text: bool = True,
) -> optax.GradientTransformation:
    """Clip -> AdamW per group. ``freeze_text`` zeroes the text group."""
    schedules = make_lr_schedules(cfg, steps_per_epoch)

    def adamw(group: str) -> optax.GradientTransformation:
        if group == "text" and freeze_text:
            return optax.set_to_zero()
        return optax.adamw(schedules[group], weight_decay=cfg.weight_decay)

    tx = optax.multi_transform(
        {g: adamw(g) for g in ("main", "backbone", "text")},
        param_labels(params),
    )
    return optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
