"""Schedules, metric writer, and reference-exact gather-path coverage."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from eda_tpu.config import ModelConfig, TrainConfig
from eda_tpu.train.optim import make_lr_schedules


def test_multistep_schedule_decays_at_epoch_boundaries():
    # Reference quirk (lr_scheduler.py:80-85): milestones are offset by the
    # RAW warmup_epoch (-1 when disabled), so decay lands at (m + 1) epochs.
    cfg = TrainConfig(lr=1e-3, lr_decay_epochs=(2, 4), lr_decay_rate=0.1)
    sched = make_lr_schedules(cfg, steps_per_epoch=10)["main"]
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(29)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(30)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 1e-5, rtol=1e-6)


def test_warmup_schedule_ramps():
    cfg = TrainConfig(lr=1e-3, warmup_epoch=1, warmup_multiplier=10)
    sched = make_lr_schedules(cfg, steps_per_epoch=10)["main"]
    assert float(sched(0)) < 2e-4
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)


def test_cosine_schedule():
    cfg = TrainConfig(lr=1e-3, lr_scheduler="cosine", max_epoch=10)
    sched = make_lr_schedules(cfg, steps_per_epoch=10)["main"]
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-5)
    assert float(sched(99)) < 1e-4


def test_metric_writer_jsonl(tmp_path):
    from eda_tpu.utils.metrics import MetricWriter

    writer = MetricWriter(str(tmp_path), enabled=True)
    writer.write(1, {"loss": 3.5}, group="train")
    writer.write(2, {"acc": 0.5}, group="val")
    writer.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 3.5 and lines[0]["group"] == "train"
    assert lines[1]["acc"] == 0.5


def test_gather_path_model_forward(rng):
    """The reference-exact SA path (ball query + gather + BN) still works."""
    from eda_tpu.models import EDAGrounder

    cfg = dataclasses.replace(
        ModelConfig().tiny(),
        sa_impl="gather",
        num_points=512,
        sa_npoints=(128, 64, 32, 16),
        num_encoder_layers=1,
        num_decoder_layers=1,
    )
    inputs = {
        "point_clouds": jnp.asarray(
            rng.uniform(-2, 2, (1, cfg.num_points, 6)).astype(np.float32)
        ),
        "text_ids": jnp.asarray(rng.integers(4, cfg.text_vocab_size, (1, 16)).astype(np.int32)),
        "text_mask": jnp.asarray(np.ones((1, 16), bool)),
    }
    model = EDAGrounder(cfg)
    variables = jax.jit(lambda: model.init(jax.random.key(0), inputs, train=False))()
    out = model.apply(variables, inputs, train=False)
    assert out["last_center"].shape == (1, cfg.num_queries, 3)
    assert np.isfinite(np.asarray(out["last_center"])).all()
