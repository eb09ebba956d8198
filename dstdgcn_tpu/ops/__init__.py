from . import dstd
from .dstd import (aggregate_spatial, aggregate_temporal,
                   dyn_adjacency_spatial, dyn_adjacency_temporal,
                   dstd_spatial, dstd_temporal, sddmm_pairwise_tanh)

__all__ = [
    "dstd", "aggregate_spatial", "aggregate_temporal",
    "dyn_adjacency_spatial", "dyn_adjacency_temporal", "dstd_spatial",
    "dstd_temporal", "sddmm_pairwise_tanh",
]
