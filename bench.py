#!/usr/bin/env python
"""End-to-end grounding throughput benchmark.

Measures scenes/sec/chip for the full-size EDAGrounder forward pass (50k-point
scenes, RoBERTa-base-geometry text encoder, 3 encoder + 6 decoder layers, 256
queries) on the available accelerator, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}

Baseline note (BASELINE.md): the reference publishes no throughput numbers.
``A100_BASELINE_SCENES_PER_SEC`` is a documented estimate of the reference
stack's A100 inference throughput: BUTD-DETR-class models at batch 12 run a
forward in roughly 0.3 s on A100-class hardware (~40 scenes/sec); the
BASELINE.json target is >= 3x that per chip.

Both the forward (serving) and train-step throughputs are measured by
default — the reference's own recipe is a *training* workload
(``/root/reference/scripts/train_scanrefer.sh``) — and each prints its own
JSON line; the forward (headline) line prints last. ``--no-train`` skips the
train measurement (it adds a long backward compile).

Usage:
    python bench.py            # full-size model on the default backend (TPU)
    python bench.py --dry      # tiny config smoke run (CPU-friendly)
    python bench.py --no-train # forward only
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eda_tpu.config import ModelConfig, TrainConfig
from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
from eda_tpu.losses.criterion import SetCriterionConfig
from eda_tpu.models import EDAGrounder

A100_BASELINE_SCENES_PER_SEC = 40.0
# Train-step estimate for the reference stack on A100: BUTD-DETR-class models
# at batch 12 take ~0.8 s/step on A100-class hardware including the 14
# scipy-on-host Hungarian round-trips (SURVEY.md §3.1) -> ~15 scenes/sec.
A100_TRAIN_BASELINE_SCENES_PER_SEC = 15.0


def build(cfg: ModelConfig, batch_size: int, text_len: int):
    gen = SyntheticScenes(
        SyntheticConfig(
            num_points=cfg.num_points,
            num_objects=8,
            text_len=text_len,
            max_objects=cfg.max_detected_boxes,
        ),
        vocab_size=cfg.text_vocab_size,
    )
    batch = jax.tree_util.tree_map(
        jnp.asarray, gen.batch(range(batch_size), butd=cfg.butd)
    )
    model = EDAGrounder(cfg)
    variables = jax.jit(lambda: model.init(jax.random.key(0), batch["inputs"], train=False))()
    return model, variables, batch


def _force(x):
    """Force completion with a scalar-only device->host fetch.

    On tunneled backends block_until_ready can return early and fetching a
    full array measures link bandwidth, not compute — a scalar read of a
    dependent value is the only honest sync.
    """
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _report_spread(name: str, times, inner: int, batch: int) -> None:
    """Median + min/max scenes/sec across repetitions, to stderr — makes a
    noisy tunnel measurement visible instead of silently trusted (the round-3
    README/BENCH 12% discrepancy traced to an unmeasured kernel-default flip;
    the spread line rules noise in or out at a glance)."""
    sps = sorted(batch * inner / t for t in times)
    med = float(np.median(sps))
    print(
        f"{name} reps={len(sps)}: median {med:.2f} scenes/sec "
        f"(min {sps[0]:.2f}, max {sps[-1]:.2f})",
        file=sys.stderr,
    )


def bench_forward(model, variables, batch, iters: int = 20, inner: int = 4) -> float:
    """Amortize dispatch overhead with ``inner`` chained forwards per call.

    Each iteration's input is perturbed by a value that depends on the
    previous iteration's output — without the data dependence XLA hoists the
    loop-invariant forward out of the loop (CSE) and the loop measures one
    forward divided by ``inner``.
    """

    @jax.jit
    def fwd_n(v, x):
        def body(_, carry):
            acc, pc = carry
            inputs = dict(x)
            inputs["point_clouds"] = pc
            out = model.apply(v, inputs, train=False)
            s = jnp.sum(out["last_center"])
            return acc + s, pc + (s * 1e-20).astype(pc.dtype)

        acc, _ = jax.lax.fori_loop(
            0, inner, body, (0.0, x["point_clouds"])
        )
        return acc

    _force(fwd_n(variables, batch["inputs"]))
    times = []
    for _ in range(max(iters // inner, 5)):
        t0 = time.perf_counter()
        _force(fwd_n(variables, batch["inputs"]))
        times.append(time.perf_counter() - t0)
    bs = batch["inputs"]["point_clouds"].shape[0]
    _report_spread("forward", times, inner, bs)
    dt = float(np.median(times)) / inner
    return bs / dt


def bench_train(
    model, variables, batch, cfg: ModelConfig, iters: int = 10,
    inner: int = 4,
) -> float:
    """Chain ``inner`` full train steps inside one jit (lax.scan over the
    evolving TrainState) so the ~35 ms tunnel dispatch amortizes — the same
    honesty rule as ``bench_forward``. No CSE hazard: each iteration's
    params differ, so XLA cannot hoist the step."""
    from eda_tpu.train import TrainState, make_optimizer, make_train_step

    crit = SetCriterionConfig(num_decoder_layers=cfg.num_decoder_layers)
    tx = make_optimizer(TrainConfig(), variables["params"], steps_per_epoch=1000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = make_train_step(model, crit, donate=False)
    # un-nest the step's own jit inside the scan: tracing a jitted callee
    # under scan re-enters the dispatch path per iteration and slows the
    # outer compile dramatically
    step = getattr(step, "__wrapped__", step)
    rng = jax.random.key(0)

    @jax.jit
    def step_n(state):
        def body(s, _):
            s, m = step(s, batch, rng)
            return s, m["loss"]
        s, losses = jax.lax.scan(body, state, None, length=inner)
        return s, losses[-1]

    state, loss = step_n(state)
    _force(loss)
    times = []
    for _ in range(max(iters // inner, 4)):
        t0 = time.perf_counter()
        state, loss = step_n(state)
        _force(loss)
        times.append(time.perf_counter() - t0)
    bs = batch["inputs"]["point_clouds"].shape[0]
    _report_spread("train", times, inner, bs)
    dt = float(np.median(times)) / inner
    return bs / dt


def bench_eval(model, variables, batch, iters: int = 8) -> float:
    """End-to-end EVALUATION throughput: one fused jitted forward+scoring
    dispatch (``train.step.make_eval_score_step``) + host counter
    accumulation — the loop ``train.py:evaluate`` actually runs per val
    batch. This necessarily includes one host round-trip per batch (the
    evaluator pulls the (P, M, B, 10) IoU stack to count), so on a tunneled
    backend each batch carries the ~35 ms dispatch overhead a local chip
    would not pay; the number is therefore a lower bound."""
    from eda_tpu.eval.grounding import GroundingEvaluator
    from eda_tpu.train import make_eval_score_step

    ev = GroundingEvaluator(prefixes=("last_",))
    score_fn = make_eval_score_step(
        model, prefixes=ev.prefixes, modes=ev.modes
    )
    ious = np.asarray(
        score_fn(variables["params"], variables["batch_stats"], batch)
    )
    ev.evaluate(None, None, ious=ious)  # compile fused forward+scoring
    times = []
    for _ in range(max(iters, 5)):
        ev = GroundingEvaluator(prefixes=("last_",))
        t0 = time.perf_counter()
        ious = np.asarray(
            score_fn(variables["params"], variables["batch_stats"], batch)
        )
        ev.evaluate(None, None, ious=ious)
        times.append(time.perf_counter() - t0)
    bs = batch["inputs"]["point_clouds"].shape[0]
    _report_spread("eval[serial]", times, 1, bs)

    # the actual train.py:evaluate loop is one-deep PIPELINED: batch i+1 is
    # dispatched before batch i's IoU stack is fetched, so the per-batch
    # host round-trip overlaps the next batch's device compute; measure
    # that loop's steady-state throughput over the whole run
    reps = []
    n = max(iters, 5)
    for _ in range(3):
        ev = GroundingEvaluator(prefixes=("last_",))
        pending = None
        t0 = time.perf_counter()
        for _ in range(n):
            ious_dev = score_fn(
                variables["params"], variables["batch_stats"], batch
            )
            if pending is not None:
                ev.evaluate(None, None, ious=np.asarray(pending))
            pending = ious_dev
        ev.evaluate(None, None, ious=np.asarray(pending))
        reps.append((time.perf_counter() - t0) / n)
    _report_spread("eval[pipelined]", reps, 1, bs)
    return bs / (float(np.median(reps)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dry", action="store_true", help="tiny smoke config")
    parser.add_argument(
        "--no-train", action="store_true", help="skip the train-step bench"
    )
    parser.add_argument(
        "--eval", action="store_true",
        help="also measure evaluator throughput (forward + scoring + host "
        "counters, the train.py:evaluate loop)",
    )
    # kept for compatibility with round-2 docs; train now runs by default
    parser.add_argument("--train", action="store_true", help=argparse.SUPPRESS)
    # serving throughput keeps rising slightly to batch 32 on v5e (the
    # serial FPS steps amortize across the batch): 141 vs 136 scenes/sec.
    # Doubling again to 64 is nearly flat (round-5 measured: fwd 290.7 vs
    # 284.1, train 100.5 vs 100.6, serial eval 259.0 vs 241.2) — the model
    # is compute-saturated at 32, which stays the default (and matches the
    # recorded BENCH_r* history).
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument(
        "--impl", default="fused", choices=["fused", "gather"],
        help="SA implementation: 'fused' is the production TPU path; "
        "'gather' prices the reference-exact fallback (ball query + "
        "nsample cap + BN) that the released-.pth parity protocol needs "
        "(ACCURACY.md preamble)",
    )
    parser.add_argument(
        "--no-mfu", action="store_true",
        help="skip the analytic-FLOPs MFU accounting (eda_tpu/utils/flops.py)",
    )
    parser.add_argument(
        "--fused_qkv",
        type=int,
        default=None,
        help="override ModelConfig.fused_qkv (0/1) for A/B runs",
    )
    args = parser.parse_args()

    import dataclasses

    cfg = ModelConfig().tiny() if args.dry else ModelConfig(use_bf16=True)
    if args.fused_qkv is not None:
        cfg = dataclasses.replace(cfg, fused_qkv=bool(args.fused_qkv))
    if args.impl != "fused":
        cfg = dataclasses.replace(cfg, sa_impl=args.impl)
    batch_size = 2 if args.dry else args.batch
    text_len = 32 if args.dry else 64

    if args.dry:
        # CPU smoke: never touch the remote-TPU tunnel for the tiny config
        # (the JAX_PLATFORMS env var is ignored on this image — set the
        # config after import instead)
        jax.config.update("jax_platforms", "cpu")

    # The remote-TPU tunnel can be transiently UNAVAILABLE (a killed client
    # wedges the single compile slot for a while); retry backend init so a
    # blip doesn't cost the whole benchmark run.
    for attempt in range(10):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            print(
                f"backend init failed (attempt {attempt + 1}/10): {e}",
                file=sys.stderr,
            )
            if attempt == 9:
                raise
            try:  # jax caches failed init; drop it so the retry is real
                from jax._src import xla_bridge as _xb

                _xb._clear_backends()
            except Exception:
                pass
            time.sleep(60)

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", file=sys.stderr)
    model, variables, batch = build(cfg, batch_size, text_len)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"params: {n_params / 1e6:.1f}M", file=sys.stderr)

    scenes_per_sec = bench_forward(model, variables, batch, iters=args.iters)
    print(f"forward: {scenes_per_sec:.2f} scenes/sec", file=sys.stderr)

    tps = None
    if not args.no_train:
        tps = bench_train(model, variables, batch, cfg, iters=max(2, args.iters // 2))
        print(f"train: {tps:.2f} scenes/sec", file=sys.stderr)

    # Analytic-FLOPs MFU (eda_tpu/utils/flops.py): issued vs useful matmul
    # FLOP/s against the v5e bf16 MXU peak. Fused path only — the gather
    # path's grouped-MLP shape needs a different model and is priced by its
    # own throughput line.
    mfu = {}
    if not args.no_mfu and args.impl == "fused" and not args.dry:
        from eda_tpu.utils.flops import measure_sa_occupancy, mfu_summary

        pcs = np.asarray(batch["inputs"]["point_clouds"][:4])
        occ = measure_sa_occupancy(pcs, cfg)
        mfu = mfu_summary(
            cfg, batch_size, text_len,
            fwd_time_s=batch_size / scenes_per_sec,
            train_time_s=(batch_size / tps) if tps else None,
            occupancy=occ,
        )
        print(
            "mfu: fwd {:.1%} (useful {:.1%}){}; occupancy {}".format(
                mfu["fwd_mfu"], mfu["fwd_useful_mfu"],
                ", train {:.1%} (useful {:.1%})".format(
                    mfu["train_mfu"], mfu["train_useful_mfu"]
                ) if tps else "",
                [round(o, 3) for o in occ],
            ),
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": "mfu_accounting",
            **{k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in mfu.items()},
        }))

    if tps is not None:
        train_line = {
            "metric": "grounding_train_throughput",
            "value": round(tps, 3),
            "unit": "scenes/sec/chip",
            "vs_baseline": round(tps / A100_TRAIN_BASELINE_SCENES_PER_SEC, 3),
        }
        if mfu.get("train_mfu"):
            train_line["mfu"] = round(mfu["train_mfu"], 4)
            train_line["useful_mfu"] = round(mfu["train_useful_mfu"], 4)
        print(json.dumps(train_line))

    if args.eval:
        eps = bench_eval(model, variables, batch)
        print(f"eval: {eps:.2f} scenes/sec", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "grounding_eval_throughput",
                    "value": round(eps, 3),
                    "unit": "scenes/sec/chip",
                    "vs_baseline": round(eps / A100_BASELINE_SCENES_PER_SEC, 3),
                }
            )
        )

    # headline (forward) line prints LAST so a last-JSON-line parser keeps
    # reading the same metric as previous rounds
    fwd_line = {
        "metric": "grounding_forward_throughput",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(scenes_per_sec / A100_BASELINE_SCENES_PER_SEC, 3),
    }
    if mfu.get("fwd_mfu"):
        fwd_line["mfu"] = round(mfu["fwd_mfu"], 4)
        fwd_line["useful_mfu"] = round(mfu["fwd_useful_mfu"], 4)
    print(json.dumps(fwd_line))


if __name__ == "__main__":
    main()
