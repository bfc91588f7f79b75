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
