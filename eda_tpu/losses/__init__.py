"""Matching and dense-alignment losses, fully on-device."""

from eda_tpu.losses.matcher import hungarian_match  # noqa: F401
from eda_tpu.losses.criterion import (  # noqa: F401
    SetCriterionConfig,
    compute_hungarian_loss,
)
