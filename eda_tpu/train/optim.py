"""Optimizer with the reference's three parameter groups + LR schedules.

Reference ``main_utils.py:276-305``: AdamW over {main params at --lr,
``backbone_net`` params at --lr_backbone, ``text_encoder`` params at
--text_encoder_lr (frozen in practice)}, weight decay 5e-4, per-iteration
MultiStepLR or CosineAnnealing (``utils/lr_scheduler.py:11-92``), optional
warmup, global-norm gradient clip 0.1 (``main_utils.py:500-508``).

Schedule semantics are reference-exact (pinned by
``tests/test_reference_parity_eval.py`` against the actual torch
schedulers): ``get_scheduler`` offsets milestones and the cosine horizon by
the RAW ``warmup_epoch`` — including its disabled default of -1
(``lr_scheduler.py:75-85``), so the published recipes (warmup off) decay at
iteration ``(m + 1) * iters_per_epoch``, one epoch after the flag value.
Cosine anneals to ``eta_min=1e-6`` over ``(max_epoch - warmup_epoch)``
epochs. The warmup ramp is ``base/mult * (1 + (mult-1) * t / warm_steps)``
(``lr_scheduler.py:31-35``) and the post-warmup schedule is evaluated at
``t - warm_steps``.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from eda_tpu.config import TrainConfig

COSINE_ETA_MIN = 1e-6  # lr_scheduler.py:76


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
    """Per-group LR schedules (per-iteration stepping, lr_scheduler.py:24-34).

    Returns jittable ``count -> lr`` callables where ``count`` is the number
    of optimizer updates performed so far (the lr used by update ``t`` is
    ``schedule(t)``, matching the reference's step-after-update loop:
    construction-time lr for the first iteration, then one scheduler step
    per iteration, ``main_utils.py:448-526``).
    """

    we = cfg.warmup_epoch  # raw value; -1 (disabled) still offsets milestones

    def schedule(base_lr: float) -> Callable:
        if cfg.lr_scheduler == "cosine":
            horizon = max(1, (cfg.max_epoch - we) * steps_per_epoch)

            def main(t):
                # torch CosineAnnealingLR closed form; the training horizon
                # (max_epoch * steps) never exceeds it, clamp for safety
                tt = jnp.minimum(t, horizon)
                cosf = 0.5 * (1.0 + jnp.cos(jnp.pi * tt / horizon))
                return COSINE_ETA_MIN + (base_lr - COSINE_ETA_MIN) * cosf

        else:
            milestones = jnp.asarray(
                [(m - we) * steps_per_epoch for m in cfg.lr_decay_epochs],
                jnp.int32,
            )

            def main(t):
                # torch MultiStepLR closed form: gamma ** bisect_right(ms, t)
                n = jnp.sum(t >= milestones)
                return base_lr * cfg.lr_decay_rate ** n

        if we <= 0:
            return main
        warm_steps = we * steps_per_epoch
        mult = cfg.warmup_multiplier

        def sched(t):
            tw = jnp.minimum(t, warm_steps)
            warm_lr = base_lr / mult * ((mult - 1.0) * tw / warm_steps + 1.0)
            return jnp.where(t > warm_steps, main(t - warm_steps), warm_lr)

        return sched

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
