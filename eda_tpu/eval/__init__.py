"""Evaluators: grounding accuracy, detection AP, NMS."""

from eda_tpu.eval.grounding import GroundingEvaluator  # noqa: F401
