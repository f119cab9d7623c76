from genpercept_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    put_global_batch,
    replicate,
    shard_opt_state_zero1,
    shard_params_tp,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "put_global_batch",
    "replicate",
    "shard_opt_state_zero1",
    "shard_params_tp",
]
