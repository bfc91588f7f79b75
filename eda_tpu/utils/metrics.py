"""Metric logging: JSONL always, TensorBoard when available.

Replaces the reference's ``utils/record_tensorboard.py`` wrapper with the
same fixed scalar groups (train_loss / train_lr / val_loss / val_score) on
process 0 only; additionally writes an append-only ``metrics.jsonl`` that
requires no reader infrastructure.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: str, enabled: Optional[bool] = None):
        if enabled is None:
            try:
                import jax

                enabled = jax.process_index() == 0
            except Exception:
                enabled = True
        self.enabled = enabled
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if enabled:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float], group: str = "train"):
        if not self.enabled:
            return
        record = {"step": int(step), "time": time.time(), "group": group}
        record.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for key, value in scalars.items():
                self._tb.add_scalar(f"{group}/{key}", float(value), step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
