from tante_tpu.parallel.mesh import (
    batch_sharding,
    dp_tp_mesh,
    make_mesh,
    replicated,
)
from tante_tpu.parallel.sharding import param_shardings, shard_params

__all__ = [
    "make_mesh",
    "dp_tp_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_params",
]
