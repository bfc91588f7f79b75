#!/usr/bin/env python
"""Accuracy-vs-window sweep: justify ``sa_windows`` with accuracy data.

The fused SA layers pool over all in-radius points inside a Morton window
(``ModelConfig.sa_windows``) instead of the reference's <=nsample subsample
(``pointnet2_modules.py:210-272``). Shorter windows cut pair-kernel FLOPs
(SA1 2048->1024 + SA2 512->256 bought 159 -> 220 scenes/sec on v5e) but drop
in-radius neighbors. This harness measures what that actually costs in
GROUNDING ACCURACY, not just coverage:

1. train a grounder on synthetic scenes until it localizes (the analog of
   the reference's ``--debug`` overfit mode — no ScanNet ships with the
   repo; pass ``--train-windows dense`` to train with exact windows),
2. freeze the params and evaluate held-out synthetic scenes under each
   candidate ``sa_windows`` setting (windows are a runtime knob, not a
   parameter shape, so one checkpoint serves every setting),
3. report Acc@0.25 / Acc@0.5 (top-1, bbs scoring, ``last_`` prefix) and
   forward throughput per setting as JSON lines.

Usage (full-size on TPU; ~minutes per window setting):
    python -m eda_tpu.tools.window_sweep --steps 150 --batch 8
    python -m eda_tpu.tools.window_sweep --dry        # tiny CPU smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eda_tpu.config import ModelConfig, TrainConfig
from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
from eda_tpu.eval.grounding import GroundingEvaluator
from eda_tpu.losses.criterion import SetCriterionConfig
from eda_tpu.models import EDAGrounder


def _force(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def parse_windows(spec: str, cfg: ModelConfig):
    if spec == "default":
        return tuple(cfg.sa_windows)
    if spec == "dense":
        return tuple(max(cfg.num_points, 4 * n) for n in cfg.sa_npoints)
    return tuple(int(x) for x in spec.split(","))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry", action="store_true", help="tiny CPU smoke config")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument(
        "--eval-on-train", action="store_true",
        help="evaluate the TRAINING scenes (overfit probe, the reference's "
        "--debug analog): isolates the window knob from generalization — "
        "use when steps are too few to generalize to held-out scenes",
    )
    ap.add_argument(
        "--train-windows", default="default",
        help="'default', 'dense', or comma list, e.g. 1024,256,256,256",
    )
    ap.add_argument(
        "--sweep", nargs="*",
        default=["dense", "2048,512,512,512", "1024,256,256,256",
                 "512,128,128,128"],
        help="window settings to evaluate",
    )
    ap.add_argument(
        "--impl", default="fused", choices=["fused", "gather"],
        help="SA implementation for BOTH training and eval. 'gather' is the "
        "reference-exact path (ball query + nsample cap + BatchNorm, "
        "models/pointnet2.py) — its parameters are a different tree (BN vs "
        "LN), so the fused-vs-gather accuracy delta is measured with twin "
        "trainings at the same seed/steps/data, one per impl; windows only "
        "apply to the fused path (gather evaluates once, ignoring --sweep).",
    )
    ap.add_argument(
        "--train-batches", type=int, default=4,
        help="number of training batches (train scenes = batch * this). "
        "The reference's --debug overfit contract caps annos at 128 "
        "(main_utils.py:112-113, joint_det_dataset.py:150-151): at the "
        "default --batch 8 that is --train-batches 16.",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--schedule", default="cosine", choices=["cosine", "constant"],
        help="probe LR schedule. 'cosine' decays to zero over --steps; "
        "'constant' holds --lr. The overfit calibration "
        "(tests/test_overfit_convergence.py) measured that cosine-to-zero "
        "starves the late alignment breakthrough, and the fused SA path "
        "breaks through LATER than gather at tiny scale — twin comparisons "
        "under cosine confound schedule with impl (ACCURACY.md §3).",
    )
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument(
        "--eval-every", type=int, default=0,
        help="if >0, evaluate the TRAINING scenes every N steps during "
        "training (train windows/impl) and print a JSON trace line — makes "
        "long runs yield usable convergence data even when interrupted",
    )
    ap.add_argument(
        "--save-params", default="",
        help="if set, pickle the final TrainState (step/params/batch_stats/"
        "opt_state, host numpy) to this path after training — lets a long "
        "overfit run be continued across sessions with --init-params",
    )
    ap.add_argument(
        "--init-params", default="",
        help="warm-start from a --save-params pickle. The step counter is "
        "restored, so the batch rotation, the fold_in(step) RNG stream, and "
        "the printed trace steps all CONTINUE where the saved run stopped — "
        "a staged run is stream-identical to one long run. --steps counts "
        "ADDITIONAL steps. Flags must match the saving run (same seed/batch/"
        "train-batches/impl; use --schedule constant: cosine's period is "
        "sized to --steps, which differs between stages).",
    )
    args = ap.parse_args()

    if args.dry:
        # sitecustomize force-registers the remote TPU backend; config.update
        # after import is the only way to actually get the host CPU
        jax.config.update("jax_platforms", "cpu")
    base = ModelConfig().tiny() if args.dry else ModelConfig(use_bf16=True)
    if args.dry:
        # tiny config: the full-size model cannot reach meaningful overfit
        # accuracy in a minutes-scale budget (DETR-family convergence), so
        # the accuracy-vs-window TREND is measured here at tiny scale with
        # proportionally scaled windows; full-size runs still report
        # coverage + throughput per setting.
        if args.sweep == ap.get_default("sweep"):
            args.sweep = ["dense", "256,128,64,64", "128,64,64,64",
                          "64,64,64,64"]
    gen = SyntheticScenes(
        SyntheticConfig(
            num_points=base.num_points,
            num_objects=4 if args.dry else 8,
            text_len=32 if args.dry else 64,
            max_objects=16 if args.dry else base.max_detected_boxes,
        ),
        vocab_size=base.text_vocab_size,
    )

    def make_batch(lo, hi):
        return jax.tree_util.tree_map(
            jnp.asarray, gen.batch(range(lo, hi), butd=base.butd)
        )

    train_cfg = dataclasses.replace(base, sa_impl=args.impl)
    if args.train_windows != "default":
        train_cfg = dataclasses.replace(
            train_cfg, sa_windows=parse_windows(args.train_windows, base)
        )
    if args.eval_on_train:
        # overfit probe: dropout noise roughly halves the memorization rate
        # (measured on the tiny config); the knob under test is the window,
        # not regularization
        train_cfg = dataclasses.replace(train_cfg, dropout=0.0)
    if args.impl == "gather":
        args.sweep = ["default"]  # windows are a fused-path knob
    model = EDAGrounder(train_cfg)
    batch0 = make_batch(0, args.batch)
    variables = jax.jit(
        lambda: model.init(jax.random.key(args.seed), batch0["inputs"], train=False)
    )()

    from eda_tpu.train import TrainState, make_optimizer, make_train_step

    crit = SetCriterionConfig(
        num_decoder_layers=train_cfg.num_decoder_layers, dataset="scanrefer"
    )
    if args.schedule == "cosine":
        # cosine over exactly the probe's step budget: the overfit probes
        # oscillate near convergence at constant lr (matcher churn)
        tx = make_optimizer(
            TrainConfig(lr=args.lr, lr_backbone=args.lr, clip_norm=1.0,
                        lr_scheduler="cosine", max_epoch=1),
            variables["params"],
            steps_per_epoch=max(args.steps, 1),
        )
    else:
        import optax

        tx = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(args.lr)
        )
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    if args.init_params:
        import pickle

        with open(args.init_params, "rb") as f:
            payload = pickle.load(f)
        state = state.replace(
            step=jnp.asarray(payload["step"]),
            params=jax.tree_util.tree_map(jnp.asarray, payload["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.asarray, payload["batch_stats"]
            ),
            opt_state=jax.tree_util.tree_map(
                jnp.asarray, payload["opt_state"]
            ),
        )
        print(
            f"warm-start from {args.init_params} at step "
            f"{int(jax.device_get(state.step))}", file=sys.stderr,
        )
    step = make_train_step(model, crit, donate=False)
    rng = jax.random.key(args.seed)
    n_train_batches = args.train_batches
    batches = [
        make_batch(i * args.batch, (i + 1) * args.batch)
        for i in range(n_train_batches)
    ]
    @jax.jit
    def train_fwd(v, inputs):
        return model.apply(v, inputs, train=False)

    def trace_accuracy(state):
        ev = GroundingEvaluator(prefixes=("last_",), modes=("bbs",))
        v = {"params": state.params, "batch_stats": state.batch_stats}
        for b in batches[: args.eval_batches]:
            ev.evaluate(train_fwd(v, b["inputs"]), b["targets"])
        return (ev.accuracy("last_", 0.25, 1, "bbs"),
                ev.accuracy("last_", 0.5, 1, "bbs"))

    start = int(jax.device_get(state.step))
    for i in range(start, start + args.steps):
        state, metrics = step(state, batches[i % n_train_batches], rng)
        if i % 25 == 0 or i == start + args.steps - 1:
            print(f"step {i}: loss {_force(metrics['loss']):.3f}", file=sys.stderr)
        if args.eval_every and ((i + 1) % args.eval_every == 0):
            a25, a50 = trace_accuracy(state)
            print(json.dumps({
                "trace": True, "impl": args.impl, "seed": args.seed,
                "step": i + 1, "acc_025_top1": round(a25, 4),
                "acc_05_top1": round(a50, 4),
                "loss": round(_force(metrics["loss"]), 4),
            }), flush=True)

    if args.save_params:
        import pickle

        payload = jax.tree_util.tree_map(
            np.asarray,
            jax.device_get(
                {
                    "step": state.step,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                }
            ),
        )
        with open(args.save_params, "wb") as f:
            pickle.dump(payload, f)
        print(f"saved TrainState to {args.save_params}", file=sys.stderr)

    if args.eval_on_train:
        eval_batches = batches[: args.eval_batches]
    else:
        eval_batches = [
            make_batch(1000 + i * args.batch, 1000 + (i + 1) * args.batch)
            for i in range(args.eval_batches)
        ]
    frozen = {"params": state.params, "batch_stats": state.batch_stats}

    for spec in args.sweep:
        windows = parse_windows(spec, base)
        eval_model = EDAGrounder(
            dataclasses.replace(base, sa_windows=windows, sa_impl=args.impl)
        )

        @jax.jit
        def fwd(v, inputs):
            return eval_model.apply(v, inputs, train=False)

        ev = GroundingEvaluator(prefixes=("last_",), modes=("bbs",))
        t_fwd = None
        for i, b in enumerate(eval_batches):
            t0 = time.perf_counter()
            out = fwd(frozen, b["inputs"])
            _force(out["last_center"])
            dt = time.perf_counter() - t0
            if i > 0:  # skip the compile call
                t_fwd = dt if t_fwd is None else min(t_fwd, dt)
            ev.evaluate(out, b["targets"])
        rec = {
            "impl": args.impl,
            "sa_windows": list(windows),
            "acc_025_top1": round(ev.accuracy("last_", 0.25, 1, "bbs"), 4),
            "acc_05_top1": round(ev.accuracy("last_", 0.5, 1, "bbs"), 4),
            "train_windows": list(train_cfg.sa_windows),
            "steps": args.steps,
            "seed": args.seed,
            "schedule": args.schedule,
            "lr": args.lr,
        }
        if t_fwd:
            rec["fwd_scenes_per_sec"] = round(args.batch / t_fwd, 2)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
