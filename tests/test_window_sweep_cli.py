"""CLI smoke for the accuracy-sweep tool (the ACCURACY.md harness).

Covers the round-4 trace flag: ``--eval-every`` must emit parseable
intermediate accuracy records during training so long twin-dossier runs
yield usable convergence data even when interrupted mid-budget.
"""

import json
import sys

import pytest

from eda_tpu.tools import window_sweep


@pytest.mark.slow
def test_window_sweep_trace_lines(monkeypatch, capsys):
    monkeypatch.setattr(
        sys, "argv",
        ["window_sweep", "--dry", "--eval-on-train", "--impl", "gather",
         "--steps", "2", "--eval-every", "1", "--schedule", "constant",
         "--sweep", "default"],
    )
    window_sweep.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    traces = [r for r in lines if r.get("trace")]
    finals = [r for r in lines if not r.get("trace")]
    assert [t["step"] for t in traces] == [1, 2]
    for t in traces:
        assert t["impl"] == "gather"
        assert 0.0 <= t["acc_025_top1"] <= 1.0
        assert "loss" in t
    (final,) = finals
    assert final["steps"] == 2 and final["schedule"] == "constant"
    assert 0.0 <= final["acc_025_top1"] <= 1.0
