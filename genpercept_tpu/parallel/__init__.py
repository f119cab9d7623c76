from genpercept_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_opt_state_zero1,
    shard_params_tp,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_opt_state_zero1",
    "shard_params_tp",
]
