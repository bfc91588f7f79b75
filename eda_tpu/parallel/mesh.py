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


def _check_tp_coverage(leaves, model_size: int):
    """Fail LOUDLY if the TP rules stopped matching the parameter tree.

    ``tp_param_spec`` matches flax auto-names by string; a module rename
    would silently de-shard weights (they'd replicate, still numerically
    correct, quietly ~model_size× the memory/compute). Rename-proof
    invariants checked whenever model>1:

    * every rank-3 ``kernel`` (flax MHA q/k/v/out are the only rank-3
      kernels in this stack) must receive a non-trivial spec;
    * the tree must contain BOTH column-parallel (P(None, 'model')) and
      row-parallel (P('model', None)) 2-D kernels — the FFN pair;
    * ≥20% of total parameter bytes must shard over 'model' (a mass rename
      can keep isolated matches while de-sharding the bulk).
    """
    misses, sharded_bytes, total_bytes = [], 0, 0
    has_col = has_row = False
    for path, x in leaves:
        spec = tp_param_spec(path)
        nontrivial = any(s is not None for s in spec)
        nbytes = int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
        total_bytes += nbytes
        if nontrivial:
            sharded_bytes += nbytes
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "kernel" and getattr(x, "ndim", 0) == 3 and not nontrivial:
            misses.append("/".join(getattr(k, "key", str(k)) for k in path))
        if tuple(spec) == (None, "model"):
            has_col = True
        if tuple(spec) == ("model", None):
            has_row = True
    problems = []
    if misses:
        problems.append(
            f"{len(misses)} rank-3 attention kernels got NO model-axis spec "
            f"(first: {misses[0]})"
        )
    if not has_col or not has_row:
        problems.append(
            "missing column- and/or row-parallel FFN kernels "
            f"(col={has_col}, row={has_row})"
        )
    frac = sharded_bytes / max(total_bytes, 1)
    if frac < 0.20:
        problems.append(
            f"only {frac:.1%} of parameter bytes shard over 'model'"
        )
    if problems:
        raise ValueError(
            "TP sharding coverage check failed with model="
            f"{model_size}: " + "; ".join(problems)
            + " — a flax module rename likely broke tp_param_spec's "
            "string matching (parallel/mesh.py)."
        )


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh under the TP rules.

    With model=1 meshes every spec degenerates to replication, so this is
    always safe to call; with model>1 the attention/FFN weights of the
    encoder, decoder, and text encoder are sharded over the 'model' axis,
    XLA SPMD derives the matching activation shardings and psums, and a
    coverage guard (``_check_tp_coverage``) refuses trees the TP rules no
    longer match.
    """
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    if model_size > 1:
        leaves = jax.tree_util.tree_flatten_with_path(params)[0]
        _check_tp_coverage(leaves, model_size)
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


def batch_rows_for_devices(mesh: Mesh, devices, global_batch_size: int):
    """Global-batch row indices that land on ``devices`` under
    ``batch_sharding`` — the row set a host owning those devices must
    assemble. Sorted ascending (ranges of different devices never overlap
    for a 'data'-sharded leading axis, they are asserted disjoint)."""
    sharding = batch_sharding(mesh)
    idx_map = sharding.devices_indices_map((global_batch_size,))
    want = set(devices)
    rows = []
    seen = np.zeros(global_batch_size, bool)
    for dev, idx in idx_map.items():
        if dev not in want:
            continue
        sl = idx[0]
        r = np.arange(
            sl.start or 0,
            global_batch_size if sl.stop is None else sl.stop,
        )
        assert not seen[r].any(), "overlapping device shards on batch axis"
        seen[r] = True
        rows.append(r)
    return np.sort(np.concatenate(rows)) if rows else np.zeros(0, np.int64)


def process_batch_rows(mesh: Mesh, global_batch_size: int):
    """This process's slice of every global batch — the
    ``DistributedSampler`` analog (``/root/reference/main_utils.py:229-242``:
    each rank loads only its subset of the epoch permutation). Every process
    computes the SAME epoch permutation (same seed, the reference's
    ``set_epoch`` semantics, ``main_utils.py:368``) and assembles only the
    rows whose target devices it hosts."""
    local = {d for d in mesh.devices.ravel() if d.process_index == jax.process_index()}
    return batch_rows_for_devices(mesh, local, global_batch_size)


def make_global_batch(local_batch, mesh: Mesh, global_batch_size: int):
    """Global device arrays from per-process local rows.

    ``local_batch`` holds ONLY the rows ``process_batch_rows`` assigned to
    this process (host-side augmentation/positive-map work scales 1/P with
    the process count instead of duplicating the pod's batch per host).
    Single-process: the local rows are all rows and this is byte-identical
    to ``shard_batch``.
    """
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh)
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), (global_batch_size,) + x.shape[1:]
        ),
        local_batch,
    )


def _fully_addressable(x) -> bool:
    """Predicate split out so tests can force the multi-host path."""
    return getattr(x, "is_fully_addressable", True)


def to_host_global(tree):
    """Numpy copy of a pytree that may hold NON-fully-addressable arrays.

    Single-host (or CPU-mesh test) arrays fetch directly. Under
    ``jax.distributed`` multi-host SPMD, a global array's shards live on
    other processes and ``np.asarray`` raises — those replicate through a
    jitted identity (``multihost_utils.process_allgather``), so EVERY
    process sees the full global value. This is the TPU-native analogue of
    the reference's pickle all_gather of evaluator state
    (``/root/reference/utils/misc.py:23-66``, called at
    ``src/grounding_evaluator.py:102-119``): instead of merging per-rank
    counter objects, each process counts the (replicated) global results,
    so all counters agree with no merge step.
    """

    def one(x):
        if isinstance(x, jax.Array) and not _fully_addressable(x):
            sh = x.sharding
            if isinstance(sh, NamedSharding):
                # replicate through a jitted identity: every process runs
                # this in lockstep (they iterate identical eval batches), so
                # XLA's all-gather lands the full value on every process
                rep = jax.jit(
                    lambda a: a, out_shardings=NamedSharding(sh.mesh, P())
                )(x)
                return np.asarray(rep.addressable_data(0))
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(one, tree)
