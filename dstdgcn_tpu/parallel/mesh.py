"""Device mesh construction and sharding rules.

The framework's parallelism model (SURVEY.md §2.6, BASELINE.json north
star), built the TPU way — ``jax.sharding`` + GSPMD instead of the NCCL/DDP
machinery the reference lacks anyway:

  * ``data`` axis: batch (data parallel) — batches sharded on axis 0,
    parameters replicated, gradients all-reduced by XLA over ICI;
  * ``graph`` axis: spatiotemporal-graph partition — the joint (V) axis of
    activations is sharded, so per-frame joint aggregation becomes local
    partial contractions + an XLA-inserted reduce-scatter/all-gather pair
    (the "edge partitioning with all-to-all" of the north star; see
    parallel/shard.py for the explicit shard_map formulation).

Under ``jit`` all arrays are global; ``jnp.mean`` over batch/time in
BatchNorm is automatically the *global* mean, so distributed training
preserves single-device semantics at the same global batch size.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "activation_spec",
           "activation_sharding_context", "constrain_activation"]


def make_mesh(data: Optional[int] = None, graph: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "graph") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % graph == 0, (n, graph)
        data = n // graph
    assert data * graph <= n
    arr = np.asarray(devices[:data * graph]).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def activation_spec() -> P:
    """(N, T, V, C) activations: batch over data, joints over graph."""
    return P("data", None, "graph", None)


# -- activation-constraint context -----------------------------------------
# ops.dstd consults this so model code stays mesh-agnostic: under a mesh
# context every (N, T, V, C) activation is pinned to the edge-partitioned
# layout, forcing GSPMD to keep the graph dimension sharded through the
# SDDMM/SpMM chain instead of rematerializing it replicated.

_ACTIVE_MESH: contextvars.ContextVar[Optional[Mesh]] = \
    contextvars.ContextVar("dstdgcn_active_mesh", default=None)


@contextlib.contextmanager
def activation_sharding_context(mesh: Optional[Mesh]):
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.reset(token)


def constrain_activation(x: jax.Array) -> jax.Array:
    """Apply the (data, -, graph, -) constraint if a mesh is active and the
    array is a 4D (N, T, V, C) activation."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None or x.ndim != 4:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, activation_spec()))
