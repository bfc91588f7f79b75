"""Checkpoint save/restore round-trip (orbax)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from eda_tpu.config import ModelConfig, TrainConfig
from eda_tpu.data.synthetic import SyntheticConfig, SyntheticScenes
from eda_tpu.models import EDAGrounder
from eda_tpu.train import TrainState, make_optimizer
from eda_tpu.train.checkpoint import CheckpointManager

TINY = ModelConfig().tiny()


def small_state():
    cfg = dataclasses.replace(TINY, num_decoder_layers=1, num_encoder_layers=1)
    gen = SyntheticScenes(
        SyntheticConfig(num_points=cfg.num_points, num_objects=3, text_len=16, max_objects=8),
        vocab_size=cfg.text_vocab_size,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, gen.batch([0]))
    model = EDAGrounder(cfg)
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), batch["inputs"], train=False)
    )()
    tx = make_optimizer(TrainConfig(), variables["params"], steps_per_epoch=10)
    return TrainState.create(variables["params"], variables["batch_stats"], tx)


def test_checkpoint_roundtrip(tmp_path):
    state = small_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_freq=1)
    assert mgr.latest_epoch() is None

    state = state.replace(step=jnp.asarray(42, jnp.int32))
    assert mgr.save(epoch=0, state=state)

    # fresh state restores values
    fresh = small_state()
    restored, start_epoch = mgr.restore(fresh)
    assert start_epoch == 1
    assert int(restored.step) == 42
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_save_freq(tmp_path):
    state = small_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_freq=5)
    assert not mgr.save(epoch=0, state=state)  # (0+1) % 5 != 0
    assert mgr.save(epoch=4, state=state)
    assert mgr.latest_epoch() == 4
    assert mgr.save(epoch=7, state=state, force=True)


def test_checkpoint_skip_optimizer(tmp_path):
    state = small_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_freq=1)
    mgr.save(epoch=0, state=state)
    fresh = small_state()
    restored, _ = mgr.restore(fresh, restore_optimizer=False)
    # opt_state untouched (reference --eval/--reduce_lr path)
    x = jax.tree_util.tree_leaves(fresh.opt_state)
    y = jax.tree_util.tree_leaves(restored.opt_state)
    for a, b in zip(x, y):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
