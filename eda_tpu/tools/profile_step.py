#!/usr/bin/env python
"""Trace train/eval steps with jax.profiler and print a per-op time table.

The reference has no profiling story (SURVEY §5 calls jax.profiler a "free
win"); this tool is how the round-2 kernel work was driven: capture an
xplane trace of N real steps on the TPU, aggregate HLO self-times, and
print the top ops + coarse buckets (SA kernels fwd/bwd, XLA model fwd/bwd,
loss, other). Requires the ``xprof`` / ``tensorboard_plugin_profile``
package to parse traces (present in this image; gated import otherwise).

Usage:
    python -m eda_tpu.tools.profile_step                # train step, batch 32
    python -m eda_tpu.tools.profile_step --eval         # inference forward
    python -m eda_tpu.tools.profile_step --parse DIR    # re-parse a trace
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import re
import sys
import tempfile


def capture(args) -> str:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from eda_tpu.config import ModelConfig, TrainConfig
    from eda_tpu.losses.criterion import SetCriterionConfig
    from eda_tpu.train import TrainState, make_optimizer, make_train_step

    cfg = ModelConfig().tiny() if args.dry else ModelConfig(use_bf16=True)
    model, variables, batch = bench.build(
        cfg, args.batch, 32 if args.dry else 64
    )
    tracedir = args.out or tempfile.mkdtemp(prefix="eda_trace_")
    if args.eval:
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        out = fwd(variables, batch["inputs"])  # compile
        float(jnp.sum(out["last_center"]))
        jax.profiler.start_trace(tracedir)
        for _ in range(args.steps):
            out = fwd(variables, batch["inputs"])
            float(jnp.sum(out["last_center"]))
        jax.profiler.stop_trace()
        return tracedir

    crit = SetCriterionConfig(num_decoder_layers=cfg.num_decoder_layers)
    tx = make_optimizer(TrainConfig(), variables["params"], steps_per_epoch=1000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = make_train_step(model, crit, donate=False)
    rng = jax.random.key(0)
    state, m = step(state, batch, rng)  # compile
    print(f"warm loss {float(m['loss']):.3f}", file=sys.stderr)
    jax.profiler.start_trace(tracedir)
    for _ in range(args.steps):
        state, m = step(state, batch, rng)
        float(m["loss"])
    jax.profiler.stop_trace()
    return tracedir


def bucket(row) -> str:
    fw = row.get("Framework op name") or ""
    name = row.get("HLO op name") or ""
    if "sa_pair_pool_bwd" in name:
        return "SA bwd kernel"
    if "sa_pair_pool" in name or ("pallas" in name and "/sa" in fw):
        return "SA fwd kernel"
    if "furthest_point" in fw or "fps" in name:
        return "FPS kernel"
    if "transpose(jvp" in fw:
        return "backbone bwd (XLA)" if "backbone_net" in fw else "model bwd (XLA)"
    if "backbone_net" in fw:
        return "backbone fwd (XLA)"
    if "text_encoder" in fw:
        return "text fwd"
    if any(k in fw for k in ("loss", "criterion", "matcher", "hungarian")):
        return "loss"
    return "other"


def report(tracedir: str, steps: int, top: int = 20) -> None:
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # pragma: no cover - image-dependent
        print("xprof / tensorboard_plugin_profile not available; "
              f"raw trace left at {tracedir}", file=sys.stderr)
        return
    xspaces = glob.glob(tracedir + "/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(xspaces, "hlo_stats", {})
    table = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c.get("label") for c in table["cols"]]
    rows = [
        dict(zip(cols, [c.get("v") for c in r["c"]])) for r in table["rows"]
    ]
    rows = [r for r in rows if r.get("Avg. self time (us)")]
    rows.sort(key=lambda r: -r["Total self time (us)"])
    total = sum(r["Total self time (us)"] for r in rows) / steps / 1000
    print(f"total device self time: {total:.1f} ms/step")
    print(f"--- top {top} ops ---")
    for r in rows[:top]:
        fw = re.sub(r"jit\(\w+\)/", "", r.get("Framework op name") or "")[:90]
        print(
            f'{r["Avg. self time (us)"]/1000:8.2f} ms '
            f'{r["Total self time (%)"]:5.1f}% '
            f'{(r.get("HLO op category") or "")[:14]:14} {fw}'
        )
    agg = collections.Counter()
    for r in rows:
        agg[bucket(r)] += r["Total self time (us)"]
    print("--- buckets ---")
    for k, v in agg.most_common():
        print(f"{v/steps/1000:8.1f} ms  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval", action="store_true", help="profile inference")
    ap.add_argument("--dry", action="store_true", help="tiny config")
    ap.add_argument("--out", help="trace output dir")
    ap.add_argument("--parse", help="skip capture; parse this trace dir")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()
    tracedir = args.parse or capture(args)
    report(tracedir, args.steps, args.top)


if __name__ == "__main__":
    main()
