"""Overfit-convergence integration test — the reference's ``--debug`` mode.

The reference's de-facto integration test is overfitting 128 samples
(``main_utils.py:112-113``: ``--debug`` truncates the dataset); a model that
can drive Acc@0.25 high on its own training scenes has exercised
matcher -> losses -> optimizer -> evaluator as one working numeric loop.
The CLI analog here is ``python train.py --debug --dataset synthetic``.

Calibration (measured on this image, tiny config, 8 synthetic scenes,
constant-LR AdamW 1e-3, batch 8): box regression converges first
(loss_bbox 0.90 -> 0.16 by step 400) while the ALIGNMENT losses plateau
(loss_ce ~2.8, loss_sem_align ~5.3) until a breakthrough near step 550,
after which ce/sem_align fall (2.0/4.5 by step 600) and bbs-scored
Acc@0.25 Top-1 lifts off (0 -> 0.12 and rising). Soft-token alignment is
the slow component at tiny scale, NOT the box head — full convergence to
>=0.9 takes thousands of steps (~2 s/step on this image's single CPU
core), so the full run is opt-in:

Round-4 measurement of the full curve (window_sweep --eval-on-train,
tiny config, 32 scenes, batch 8, constant-LR AdamW 1e-3, gather impl at
~1 s/step): Acc@0.25 Top-1 = 0.91 at step 1000 and 0.94 (Acc@0.5 0.81)
at step 1500 — the >=0.9 contract IS reachable and the breakthrough
lands between steps 500 and 1000 at this LR, so the default
EDA_OVERFIT_STEPS budget carries real headroom.

    EDA_RUN_OVERFIT=1 python -m pytest tests/test_overfit_convergence.py -m slow -s

The default suite runs the same loop truncated to a smoke: losses must
fall and the evaluator must produce finite, nonzero-able accuracy wiring.
"""

import dataclasses
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eda_tpu.config import ModelConfig
from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
from eda_tpu.eval.grounding import GroundingEvaluator
from eda_tpu.losses.criterion import SetCriterionConfig
from eda_tpu.models import EDAGrounder
from eda_tpu.train import TrainState, make_train_step


def _overfit(num_scenes, batch, steps, eval_every, target, lr=1e-3, seed=0):
    """Train the tiny grounder on its own scenes; return the accuracy trace.

    Constant-LR AdamW: the probe's cosine-to-zero schedule (window_sweep)
    starves the late alignment breakthrough the calibration run measured.
    """
    cfg = dataclasses.replace(ModelConfig().tiny(), dropout=0.0)
    gen = SyntheticScenes(
        SyntheticConfig(num_points=cfg.num_points, num_objects=4,
                        text_len=32, max_objects=16),
        vocab_size=cfg.text_vocab_size,
    )
    batches = [
        jax.tree_util.tree_map(
            jnp.asarray,
            gen.batch(range(i, min(i + batch, num_scenes)), butd=cfg.butd),
        )
        for i in range(0, num_scenes, batch)
    ]
    model = EDAGrounder(cfg)
    variables = jax.jit(
        lambda: model.init(jax.random.key(seed), batches[0]["inputs"], train=False)
    )()
    crit = SetCriterionConfig(
        num_decoder_layers=cfg.num_decoder_layers, dataset="scanrefer"
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = make_train_step(model, crit, donate=False)
    rng = jax.random.key(seed)

    @jax.jit
    def fwd(v, inputs):
        return model.apply(v, inputs, train=False)

    def accuracy(state):
        ev = GroundingEvaluator(prefixes=("last_",), modes=("bbs",))
        v = {"params": state.params, "batch_stats": state.batch_stats}
        for b in batches:
            ev.evaluate(fwd(v, b["inputs"]), b["targets"])
        return ev.accuracy("last_", 0.25, 1, "bbs")

    first_loss, last_loss, trace = None, None, []
    for i in range(steps):
        state, metrics = step(state, batches[i % len(batches)], rng)
        if first_loss is None:
            first_loss = float(metrics["loss"])
        last_loss = float(metrics["loss"])
        if (i + 1) % eval_every == 0 or i == steps - 1:
            acc = accuracy(state)
            trace.append((i + 1, acc, last_loss))
            print(f"step {i + 1}: loss {last_loss:.3f} acc@0.25top1 {acc:.3f}",
                  flush=True)
            if acc >= target:
                break
    return first_loss, last_loss, trace


def test_overfit_smoke_losses_fall_and_eval_wires():
    """Truncated loop: losses fall, the evaluator consumes real end_points."""
    first, last, trace = _overfit(
        num_scenes=4, batch=4, steps=30, eval_every=30, target=1.1
    )
    assert last < 0.75 * first, (first, last)
    (step_n, acc, _), = trace
    assert step_n == 30
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("EDA_RUN_OVERFIT"),
    reason="multi-hour on this image's single CPU core; "
    "set EDA_RUN_OVERFIT=1 (see module docstring for calibration data)",
)
def test_overfit_128_converges():
    """128 scenes to Acc@0.25 Top-1 >= 0.9 (the reference --debug contract)."""
    scenes = int(os.environ.get("EDA_OVERFIT_SCENES", "128"))
    steps = int(os.environ.get("EDA_OVERFIT_STEPS", "20000"))
    target = float(os.environ.get("EDA_OVERFIT_TARGET", "0.9"))
    _, _, trace = _overfit(
        num_scenes=scenes, batch=8, steps=steps, eval_every=250, target=target
    )
    best = max(acc for _, acc, _ in trace)
    assert best >= target, trace[-5:]
