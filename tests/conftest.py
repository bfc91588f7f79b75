"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware. Multi-device sharding tests run on 8 virtual
CPU devices (the JAX answer to "test distributed without a cluster" — the
reference has no equivalent; its world-size-1 NCCL launch is the degenerate
case, see SURVEY.md §4).
"""

import os

# Persistent compilation cache: full-model CPU compiles are slow; the cache
# makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# This image's sitecustomize force-registers a remote TPU backend and
# overrides JAX_PLATFORMS after env parsing — config.update is the only way
# to actually get the host CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="run the slow tier (full-model compiles / subprocess CLIs); "
        "also enabled by EDA_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r4 item 7): the default `pytest -q` skips the
    full-model-compile tier so a cold run stays in minutes; the full tier
    runs with `--slow` (or EDA_SLOW=1) and is part of the documented
    workflow (CLAUDE.md)."""
    if config.getoption("--slow") or os.environ.get("EDA_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --slow (or EDA_SLOW=1) to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
