"""Device mesh and sharding rules."""

from eda_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
    shard_params,
    tp_param_spec,
)
