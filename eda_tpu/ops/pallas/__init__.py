"""Pallas TPU kernels for the hot point-cloud ops.

Each kernel has a pure-jnp twin in ``eda_tpu.ops.pointops`` that serves as the
correctness oracle (tests compare the two) and as the CPU fallback. Use
``eda_tpu.ops.dispatch`` to select automatically per backend.
"""

from eda_tpu.ops.pallas.fps import furthest_point_sample_pallas  # noqa: F401
from eda_tpu.ops.pallas.sa_kernel import sa_pair_pool_pallas  # noqa: F401

