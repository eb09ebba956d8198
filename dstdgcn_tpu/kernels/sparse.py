"""Blocked sparse SpMM / SDDMM Pallas kernels for large graphs.

The framework's general message-passing op surface (BASELINE.json): the
skeleton model's V~22 graphs are served by fused XLA contractions
(ops.dstd), but the *framework* must aggregate over arbitrary
spatiotemporal graphs.  These kernels tile the (V x V) adjacency into
MXU-aligned blocks and iterate only the *active* blocks of a sparsity
pattern, compacted into scalar-prefetched (row, col) block lists — DMA and
compute are skipped entirely for empty blocks, which is where sparse
graphs beat dense einsums.

Ops:
  * ``block_spmm``        out[n,i,c] = sum_j A[n,i,j] x[n,j,c]
  * ``block_sddmm``       S[n,i,j]   = sum_r w[r] tanh(q[n,i,r]-k[n,j,r])
                          (the DSTD constrained-correlation score family)
  * ``block_sddmm_spmm``  out = S @ x fused — the score block never leaves
                          VMEM (FusedMM-style; see PAPERS.md).

Pattern helpers build the block lists from a boolean block mask; rows with
no active blocks are given their diagonal block so every output block is
written.  All kernels have dense jnp oracles (``*_dense``) used for golden
tests and as the small-graph fallback.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = [
    "active_blocks", "block_spmm", "block_sddmm", "block_sddmm_spmm",
    "spmm_dense", "sddmm_dense", "sddmm_spmm_dense", "available",
]


def available() -> bool:
    return _PALLAS_OK and jax.default_backend() in ("tpu", "cpu")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# sparsity pattern
# ---------------------------------------------------------------------------

def active_blocks(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(BI, BJ) bool block mask -> (rows, cols) int32 lists, row-major.

    Every row is guaranteed at least one block (its diagonal, or column 0
    for non-square masks) so each output block row is initialized.
    """
    mask = np.asarray(mask, bool).copy()
    bi, bj = mask.shape
    for i in range(bi):
        if not mask[i].any():
            mask[i, min(i, bj - 1)] = True
    rows, cols = np.nonzero(mask)
    return rows.astype(np.int32), cols.astype(np.int32)


# ---------------------------------------------------------------------------
# dense oracles
# ---------------------------------------------------------------------------

def spmm_dense(adj, x):
    """out[n,i,c] = sum_j adj[n,i,j] * x[n,j,c]."""
    return jnp.einsum("nij,njc->nic", adj, x,
                      preferred_element_type=jnp.float32)


def sddmm_dense(q, k, w, mask=None):
    """S[n,i,j] = sum_r w[r] * tanh(q[n,i,r] - k[n,j,r]) (masked)."""
    s = jnp.tanh(q[:, :, None, :] - k[:, None, :, :])
    s = jnp.einsum("nijr,r->nij", s, w, preferred_element_type=jnp.float32)
    if mask is not None:
        s = s * mask
    return s


def sddmm_spmm_dense(q, k, w, x, mask=None):
    return spmm_dense(sddmm_dense(q, k, w, mask), x)


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------

def _spmm_kernel(rows_ref, cols_ref, adj_ref, x_ref, out_ref):
    a = pl.program_id(0)
    first = jnp.logical_or(a == 0, rows_ref[a] != rows_ref[a - 1])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # batched over samples: (N, bi, bj) @ (N, bj, C)
    out_ref[:] += jax.lax.dot_general(
        adj_ref[:], x_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _block_spmm_pallas(adj, x, rows, cols, block: int = 128):
    """Blocked SpMM over the active (row, col) block list (forward only).

    adj (N, V, V), x (N, V, C) -> (N, V, C); V % block == 0; the block list
    must be row-major sorted with every row present (see active_blocks).
    All samples are processed per program (grid = active blocks only).
    """
    n, v, _ = adj.shape
    c = x.shape[-1]
    na = len(rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(na,),
        in_specs=[
            pl.BlockSpec((n, block, block),
                         lambda a, rows, cols: (0, rows[a], cols[a])),
            pl.BlockSpec((n, block, c),
                         lambda a, rows, cols: (0, cols[a], 0)),
        ],
        out_specs=pl.BlockSpec(
            (n, block, c), lambda a, rows, cols: (0, rows[a], 0)),
    )
    return pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, v, c), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(rows), jnp.asarray(cols), adj, x)


def _sddmm_body(q_blk, kt_blk, w):
    """(N, bi, R), (N, R, bj), (R,) -> (N, bi, bj) score block; R unrolled.

    Layout-natural broadcasts: the query slice keeps bi on sublanes with a
    unit lane dim, the (pre-transposed) key slice keeps bj on lanes with a
    unit sublane dim — no per-r relayout on the VPU.
    """
    r = q_blk.shape[-1]
    acc = None
    for ri in range(r):
        s = jnp.tanh(q_blk[:, :, ri:ri + 1] - kt_blk[:, ri:ri + 1, :])
        term = w[ri] * s
        acc = term if acc is None else acc + term
    return acc


def _sddmm_kernel(rows_ref, cols_ref, q_ref, k_ref, w_ref, out_ref):
    out_ref[:] = _sddmm_body(q_ref[:], k_ref[:], w_ref)


def block_sddmm(q, k, w, rows, cols, block: int = 128):
    """Blocked masked SDDMM: scores computed only for active blocks.

    q, k (N, V, R), w (R,) -> (N, V, V).  Inactive blocks are UNWRITTEN
    (undefined memory): consumers must read only active blocks — the fused
    ``block_sddmm_spmm`` is the safe way to chain into aggregation.
    """
    n, v, r = q.shape
    na = len(rows)
    kt = jnp.swapaxes(k, 1, 2)  # (N, R, V): keys lane-major, once
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(na,),
        in_specs=[
            pl.BlockSpec((n, block, r),
                         lambda a, rows, cols: (0, rows[a], 0)),
            pl.BlockSpec((n, r, block),
                         lambda a, rows, cols: (0, 0, cols[a])),
            pl.BlockSpec((r,), lambda a, rows, cols: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (n, block, block),
            lambda a, rows, cols: (0, rows[a], cols[a])),
    )
    out = pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, v, v), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(rows), jnp.asarray(cols), q, kt, w)
    return out


def _sddmm_spmm_kernel(rows_ref, cols_ref, q_ref, kt_ref, w_ref, x_ref,
                       out_ref, *, block: int):
    a = pl.program_id(0)
    first = jnp.logical_or(a == 0, rows_ref[a] != rows_ref[a - 1])

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # q / kt stay fully VMEM-resident (constant index map); slice the
    # active block here instead of re-DMAing lane-padded fragments
    i0 = pl.multiple_of(rows_ref[a] * block, block)
    j0 = pl.multiple_of(cols_ref[a] * block, block)
    q_blk = q_ref[:, pl.ds(i0, block), :]             # (N, bi, R)
    kt_blk = kt_ref[:, :, pl.ds(j0, block)]           # (N, R, bj)
    s = _sddmm_body(q_blk, kt_blk, w_ref)             # (N, bi, bj)
    out_ref[:] += jax.lax.dot_general(
        s, x_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _block_sddmm_spmm_pallas(q, k, w, x, rows, cols, block: int = 128):
    """Fused SDDMM + SpMM forward: out[n,i,c] = sum_j S[n,i,j] x[n,j,c] with
    the score block computed and consumed in VMEM (never written to HBM)."""
    n, v, r = q.shape
    c = x.shape[-1]
    na = len(rows)
    kt = jnp.swapaxes(k, 1, 2)  # (N, R, V): keys lane-major, once
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(na,),
        in_specs=[
            pl.BlockSpec((n, v, r), lambda a, rows, cols: (0, 0, 0)),
            pl.BlockSpec((n, r, v), lambda a, rows, cols: (0, 0, 0)),
            pl.BlockSpec((r,), lambda a, rows, cols: (0,)),
            pl.BlockSpec((n, block, c),
                         lambda a, rows, cols: (0, cols[a], 0)),
        ],
        out_specs=pl.BlockSpec(
            (n, block, c), lambda a, rows, cols: (0, rows[a], 0)),
    )
    return pl.pallas_call(
        functools.partial(_sddmm_spmm_kernel, block=block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, v, c), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(rows), jnp.asarray(cols), q, kt, w, x)


# ---------------------------------------------------------------------------
# differentiable wrappers: Pallas forward, masked-oracle backward
# ---------------------------------------------------------------------------
# The block lists are static (they shape the grid), so per-pattern ops are
# built once and cached.  Backward passes use the dense oracles restricted
# to the pattern mask — exact gradients, O(V^2) memory; a blocked backward
# kernel is a future optimization for very large graphs.

def _pattern_mask(rows: np.ndarray, cols: np.ndarray, bi: int, bj: int,
                  block: int) -> np.ndarray:
    m = np.zeros((bi, bj), np.float32)
    m[rows, cols] = 1.0
    return np.kron(m, np.ones((block, block), np.float32))


@functools.lru_cache(maxsize=64)
def _spmm_op(rows_b: bytes, cols_b: bytes, block: int, v: int, vj: int):
    rows = np.frombuffer(rows_b, np.int32)
    cols = np.frombuffer(cols_b, np.int32)
    mask = _pattern_mask(rows, cols, v // block, vj // block, block)

    @jax.custom_vjp
    def op(adj, x):
        return _block_spmm_pallas(adj, x, rows, cols, block)

    def fwd(adj, x):
        return op(adj, x), (adj, x)

    def bwd(res, g):
        adj, x = res
        m = jnp.asarray(mask)
        d_adj = jnp.einsum("nic,njc->nij", g, x,
                           preferred_element_type=jnp.float32) * m
        d_x = jnp.einsum("nij,nic->njc", adj * m, g,
                         preferred_element_type=jnp.float32)
        return d_adj, d_x

    op.defvjp(fwd, bwd)
    return op


def block_spmm(adj, x, rows, cols, block: int = 128):
    """Differentiable blocked SpMM (see _block_spmm_pallas for semantics)."""
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    op = _spmm_op(rows.tobytes(), cols.tobytes(), int(block),
                  int(adj.shape[1]), int(adj.shape[2]))
    return op(adj, x)


@functools.lru_cache(maxsize=64)
def _sddmm_spmm_op(rows_b: bytes, cols_b: bytes, block: int, v: int):
    rows = np.frombuffer(rows_b, np.int32)
    cols = np.frombuffer(cols_b, np.int32)
    nb = v // block
    mask = _pattern_mask(rows, cols, nb, nb, block)

    @jax.custom_vjp
    def op(q, k, w, x):
        return _block_sddmm_spmm_pallas(q, k, w, x, rows, cols, block)

    def fwd(q, k, w, x):
        return op(q, k, w, x), (q, k, w, x)

    def bwd(res, g):
        q, k, w, x = res
        m = jnp.asarray(mask)

        def f(q, k, w, x):
            return sddmm_spmm_dense(q, k, w, x, m)

        _, vjp = jax.vjp(f, q, k, w, x)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def block_sddmm_spmm(q, k, w, x, rows, cols, block: int = 128):
    """Differentiable fused SDDMM + SpMM (Pallas forward, masked-oracle
    backward)."""
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    op = _sddmm_spmm_op(rows.tobytes(), cols.tobytes(), int(block),
                        int(q.shape[1]))
    return op(q, k, w, x)
