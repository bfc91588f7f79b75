"""Logging and miscellaneous utilities."""

from eda_tpu.utils.logger import setup_logger  # noqa: F401
