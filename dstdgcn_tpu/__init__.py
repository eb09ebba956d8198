"""dstdgcn_tpu — a TPU-native spatiotemporal graph-convolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
DSTD-GCN repository (Jaakk0F/DSTD-GCN): dynamic spatiotemporal decomposed
graph convolutions for human-motion prediction on Human3.6M / CMU Mocap /
3DPW, with a general sparse-aware SpMM/SDDMM op surface, fused Pallas
kernels, a sharded ``jax.Array`` input pipeline, a jitted training engine,
and mesh-parallel execution via ``jax.sharding`` + ``shard_map``.
"""

__version__ = "0.1.0"
