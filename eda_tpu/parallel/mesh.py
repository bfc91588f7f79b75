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


def tp_param_spec(path) -> P:
    """Megatron-style tensor-parallel PartitionSpec for one parameter leaf.

    Attention shards the HEADS axis (flax MHA kernels are
    (d_model, heads, head_dim) for q/k/v and (heads, head_dim, d_model) for
    out); FFNs shard the hidden axis column-wise then row-wise, so each
    layer pair needs exactly one psum (inserted by XLA's SPMD partitioner —
    the model code never mentions the axis). Everything else replicates.
    Applies uniformly to the cross-modal encoder/decoder, the RoBERTa text
    encoder (attention/intermediate/output names), and the FFN blocks
    (Dense_0/Dense_1 inside ffn_* submodules).
    """
    keys = [getattr(k, "key", str(k)) for k in path]
    name = keys[-1]
    joined = "/".join(keys)
    if "MultiHeadDotProductAttention" in joined or "attention" in keys:
        proj = keys[-2]
        if proj in ("query", "key", "value"):
            return P(None, "model", None) if name == "kernel" else P("model", None)
        if proj == "out":
            return P("model", None, None) if name == "kernel" else P()
    # FFN pairs: column-parallel first Dense, row-parallel second
    if name == "kernel":
        parent, grand = keys[-2], keys[-3] if len(keys) >= 3 else ""
        if (parent == "Dense_0" and grand.startswith("ffn")) or parent == "intermediate":
            return P(None, "model")
        if (parent == "Dense_1" and grand.startswith("ffn")) or parent == "output":
            return P("model", None)
    if name == "bias":
        parent, grand = keys[-2], keys[-3] if len(keys) >= 3 else ""
        if (parent == "Dense_0" and grand.startswith("ffn")) or parent == "intermediate":
            return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh under the TP rules.

    With model=1 meshes every spec degenerates to replication, so this is
    always safe to call; with model>1 the attention/FFN weights of the
    encoder, decoder, and text encoder are sharded over the 'model' axis and
    XLA SPMD derives the matching activation shardings and psums.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, tp_param_spec(path))
        ),
        params,
    )


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays on the mesh, batch axis over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
