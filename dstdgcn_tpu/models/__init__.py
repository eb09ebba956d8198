from . import layers
from .dstdgcn import DSTDGCN, get_model
from .layers import (DSTDGC, DSTDGCB, ConvTemporalGraphical, JointBatchNorm,
                     PReLU, STGCNNLayer)

__all__ = [
    "layers", "DSTDGCN", "get_model", "DSTDGC", "DSTDGCB",
    "ConvTemporalGraphical", "JointBatchNorm", "PReLU", "STGCNNLayer",
]
