"""Device mesh and sharding rules."""

from eda_tpu.parallel.mesh import (  # noqa: F401
    batch_rows_for_devices,
    batch_sharding,
    make_global_batch,
    make_mesh,
    process_batch_rows,
    replicate_sharding,
    shard_batch,
    shard_params,
    to_host_global,
    tp_param_spec,
)
