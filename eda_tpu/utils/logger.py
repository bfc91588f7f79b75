"""Process-aware logging (reference ``utils/logger.py:35-99``).

Colored console on process 0, a per-process ``log.txt`` in the log dir
(rank suffix for non-zero processes, like the reference's ``.rankN`` files).
"""

from __future__ import annotations

import logging
import os
import sys


def setup_logger(
    log_dir: str, name: str = "eda_tpu", process_index: int | None = None
) -> logging.Logger:
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0

    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    logger.propagate = False

    fmt = logging.Formatter(
        "[%(asctime)s %(levelname)s] %(message)s", datefmt="%H:%M:%S"
    )
    if process_index == 0:
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(fmt)
        logger.addHandler(console)

    os.makedirs(log_dir, exist_ok=True)
    suffix = "" if process_index == 0 else f".rank{process_index}"
    fh = logging.FileHandler(os.path.join(log_dir, f"log.txt{suffix}"))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    return logger
