from . import distributed, mesh, shard
from .distributed import initialize, make_global_batch, process_info
from .mesh import (activation_sharding_context, batch_sharding,
                   constrain_activation, make_mesh, param_sharding,
                   replicated)
from .shard import (dstd_spatial_edge_partitioned, dstd_spatial_ring,
                    dstd_temporal_edge_partitioned)

__all__ = [
    "mesh", "shard", "distributed", "make_mesh", "batch_sharding",
    "replicated", "param_sharding", "activation_sharding_context", "constrain_activation",
    "dstd_spatial_edge_partitioned", "dstd_temporal_edge_partitioned",
    "dstd_spatial_ring",
    "initialize", "process_info", "make_global_batch",
]
