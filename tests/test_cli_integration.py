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
