"""Device mesh construction and sharding rules.

The reference's distribution story is DDP over NCCL (``main_utils.py:343-346``,
``train_dist_mod.py:330-347``): one process per GPU, gradient all-reduce,
SyncBatchNorm, an all_reduce for the loss normalizer and a pickle all_gather
at eval. The TPU-native replacement is *global-view compilation*: one jitted
train step over a ``jax.sharding.Mesh``, inputs sharded along the ``data``
axis, parameters replicated. XLA then derives every collective the reference
wrote by hand:

* gradient averaging  -> all-reduce on the gradient sum over 'data' (ICI);
* SyncBatchNorm       -> batch-norm reductions over the sharded batch axis
  are global automatically;
* num_boxes all_reduce (losses.py:637-638) -> a plain global sum;
* metric all_gather   -> metrics come out replicated.

A second ``model`` axis is reserved: parameters at ~60M replicate easily, but
any Dense in the stack can be sharded over it later without touching the
step function (just extend ``param_sharding_rules``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """('data', 'model') mesh over the available devices.

    Args:
        devices: defaults to all jax devices.
        data: data-parallel size; defaults to n_devices // model.
        model: model-parallel size (1 today; axis reserved).
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis ('data') sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays on the mesh, batch axis over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
