"""Device mesh and sharding rules."""

from eda_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
    shard_params,
    to_host_global,
    tp_param_spec,
)
