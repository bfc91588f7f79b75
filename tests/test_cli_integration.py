"""End-to-end CLI smoke: train a few steps on tiny synthetic scenes."""

import sys

import pytest

import train as train_cli


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    rc = train_cli.main(
        [
            "--dataset", "synthetic", "--debug", "--use_color",
            "--max_steps", "2", "--batch_size", "2",
            "--log_dir", str(tmp_path), "--print_freq", "1",
        ]
    )
    assert rc == 0
    assert (tmp_path / "config.json").exists()
    assert (tmp_path / "log.txt").exists()
    log = open(tmp_path / "log.txt").read()
    assert "loss" in log
    # checkpoint was forced on max_steps exit
    assert (tmp_path / "ckpt").exists()
    # MetricWriter is wired into the training loop
    assert (tmp_path / "metrics.jsonl").exists()
    import json

    records = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert any(r["group"] == "train" and "loss" in r for r in records)

    # eval-only mode: restores the checkpoint, evaluates the FULL val split
    # (no training steps), prints the accuracy table, and exits
    # (ref main_utils.py:356-362)
    train_cli._EVAL_CACHE.clear()
    rc = train_cli.main(
        [
            "--dataset", "synthetic", "--debug", "--use_color",
            "--eval", "--batch_size", "2",
            "--log_dir", str(tmp_path), "--steps_per_epoch", "3",
        ]
    )
    assert rc == 0
    log = open(tmp_path / "log.txt").read()
    assert "Testing evaluation" in log
    assert "Acc0.25Top1" in log
    # no new training steps ran in eval mode
    assert log.count("max_steps reached") == 1
    records = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    val = [r for r in records if r["group"] == "val"]
    assert val and any("last_Acc0.25Top1_bbf" in r for r in val)


@pytest.mark.slow
def test_evaluate_loop_matches_independent_serial_recompute(tmp_path):
    """train.evaluate — fused forward+scoring dispatch, one-deep pipelined
    IoU fetch, padded masked tail batch — must count EXACTLY like an
    independent serial recompute that runs make_eval_step per batch and
    scores inside the evaluator (the pre-fusion path). Guards the pairing
    of (ious, hardness, valid) across the pipeline lag and the tail mask."""
    import logging

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eda_tpu.eval import GroundingEvaluator
    from eda_tpu.models import EDAGrounder
    from eda_tpu.train import TrainState, make_eval_step

    args = train_cli.parse_args(
        [
            "--dataset", "synthetic", "--debug", "--use_color",
            "--batch_size", "5", "--log_dir", str(tmp_path),
        ]
    )
    model_cfg, _, _ = train_cli.build_configs(args)
    model = EDAGrounder(model_cfg)

    train_cli._EVAL_CACHE.clear()
    gen, n_val = train_cli.make_loader(args, model_cfg, "val", for_eval=True)
    batch0 = jax.tree_util.tree_map(
        jnp.asarray, gen.batch(np.arange(args.batch_size), butd=model_cfg.butd)
    )
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), batch0["inputs"], train=False)
    )()
    import optax

    state = TrainState.create(
        variables["params"], variables["batch_stats"], optax.sgd(0.0)
    )

    ev_loop = train_cli.evaluate(
        args, model, None, state, model_cfg, logging.getLogger("test_eval_loop")
    )

    # independent serial recompute over the same split/chunking
    eval_fn = make_eval_step(model)
    ev_ref = GroundingEvaluator(
        prefixes=("last_", "proposal_"), filter_non_gt_boxes=args.butd_cls
    )
    for idx, valid in train_cli.tail_chunks(n_val, args.batch_size):
        batch = jax.tree_util.tree_map(
            jnp.asarray, gen.batch(idx, butd=model_cfg.butd)
        )
        ep, _ = eval_fn(state.params, state.batch_stats, batch)
        ev_ref.evaluate(
            ep, batch["targets"], valid=valid, inputs=batch["inputs"]
        )

    assert ev_loop.dets == ev_ref.dets
    assert ev_loop.gts == ev_ref.gts
    # the split has a ragged tail (128 % 5 != 0), so the tail mask engaged
    assert n_val % args.batch_size != 0
    # _EVAL_CACHE keys (loader shapes, score_fn closure) are model-specific;
    # don't leak this test's tiny model into a later in-process evaluate
    train_cli._EVAL_CACHE.clear()
