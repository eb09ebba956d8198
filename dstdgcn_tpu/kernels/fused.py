"""Fused Pallas TPU kernels for the DSTD-GC contractions.

One kernel evaluates a full spatial (or temporal) DSTD-GC — feature
transform, SDDMM-style pairwise-tanh correlation, frame/joint mixing,
adjacency assembly, and SpMM aggregation — per block of samples, entirely
in VMEM.  The all-pairs score tensor ``(T, R, V, V)`` and the dynamic
adjacency never touch HBM (the XLA path materializes both), so HBM traffic
drops to the feature read + result write.

Semantics are identical to :mod:`dstdgcn_tpu.ops.dstd` (golden-tested);
gradients flow through a ``custom_vjp`` whose backward is derived from the
oracle, so training with ``use_pallas=True`` is exact.

Grid: one program per block of NB samples (largest of 8/4/2/1 dividing N).
Per-program VMEM at the flagship shape (T=35, V=22, C=64, NB=8) is ~8 MB.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dstd as oracle

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = ["dstd_spatial", "dstd_temporal", "available"]


def available() -> bool:
    """True when the fused whole-op kernel path is usable.

    On CPU the Pallas interpreter executes the kernel bodies (used by the
    golden tests).  On TPU the current Mosaic lowering rejects the 5D
    score-tensor transposes these bodies use for V~22 skeletons — and at
    those shapes the XLA path is already MXU-bound — so the dispatcher
    routes to the oracle there.  Large-graph Pallas kernels live in
    :mod:`dstdgcn_tpu.kernels.sparse` with Mosaic-aligned tiles.
    """
    if not _PALLAS_OK:
        return False
    return jax.default_backend() == "cpu"


def _block_samples(n: int) -> int:
    for nb in (8, 4, 2, 1):
        if n % nb == 0:
            return nb
    return 1


def _spatial_kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wm1_ref,
                    bm1_ref, wm2_ref, bm2_ref, wrm_ref, brm_ref, out_ref,
                    *, num_kernels: int, agg: str):
    nb, t, v, cin = x_ref.shape
    co = out_ref.shape[-1]
    r = wm1_ref.shape[-1]
    x = x_ref[:].reshape(nb * t * v, cin)
    alpha = alpha_ref[0, 0]
    acc = jnp.zeros((nb * t, v, co), jnp.float32)
    for k in range(num_kernels):
        xf = jnp.dot(x, wf_ref[k], preferred_element_type=jnp.float32)
        xf = (xf + bf_ref[k]).reshape(nb * t, v, co)
        q = jnp.dot(x, wm1_ref[k], preferred_element_type=jnp.float32)
        q = (q + bm1_ref[k]).reshape(nb, t, v, r)
        kk = jnp.dot(x, wm2_ref[k], preferred_element_type=jnp.float32)
        kk = (kk + bm2_ref[k]).reshape(nb, t, v, r)
        # scores: (nb, t, v, w, r) -> contraction layout (nb, v, w, r*t)
        s = jnp.tanh(q[:, :, :, None, :] - kk[:, :, None, :, :])
        s = s.transpose(0, 2, 3, 4, 1).reshape(nb, v * v, r * t)
        # frame mixing on the MXU: (v*v, r*t) @ (r*t, t)
        w_mix = wrm_ref[k].reshape(r * t, t)
        dyn = jax.lax.dot_general(
            s, w_mix, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (nb, v*v, t)
        dyn = dyn.reshape(nb, v, v, t).transpose(0, 3, 1, 2)
        adj = (dyn + brm_ref[k][None, :, None, None]) * alpha \
            + base_ref[k][None, None]
        adj = adj.reshape(nb * t, v, v)
        # per-frame aggregation (batched MXU matmuls over nb*t)
        if agg == "right":
            acc += jax.lax.dot_general(
                adj, xf, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # out[w,c]=sum_v a[v,w]x[v,c]
        else:
            acc += jax.lax.dot_general(
                adj, xf, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # out[v,c]=sum_w a[v,w]x[w,c]
    out_ref[:] = acc.reshape(nb, t, v, co)


def _temporal_kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wm1_ref,
                     bm1_ref, wm2_ref, bm2_ref, wrm_ref, brm_ref, out_ref,
                     *, num_kernels: int, agg: str):
    nb, t, v, cin = x_ref.shape
    co = out_ref.shape[-1]
    r = wm1_ref.shape[-1]
    x = x_ref[:].reshape(nb * t * v, cin)
    alpha = alpha_ref[0, 0]
    acc = jnp.zeros((nb, t, v, co), jnp.float32)
    for k in range(num_kernels):
        xf = jnp.dot(x, wf_ref[k], preferred_element_type=jnp.float32)
        xf = (xf + bf_ref[k]).reshape(nb, t, v, co)
        q = jnp.dot(x, wm1_ref[k], preferred_element_type=jnp.float32)
        q = (q + bm1_ref[k]).reshape(nb, t, v, r)
        kk = jnp.dot(x, wm2_ref[k], preferred_element_type=jnp.float32)
        kk = (kk + bm2_ref[k]).reshape(nb, t, v, r)
        # scores per joint over frame pairs: (nb, t, u, v, r)
        s = jnp.tanh(q[:, :, None, :, :] - kk[:, None, :, :, :])
        # joint mixing: contraction dim (r*v) -> output joints w
        s = s.transpose(0, 1, 2, 4, 3).reshape(nb, t * t, r * v)
        w_mix = wrm_ref[k].reshape(r * v, v)
        dyn = jax.lax.dot_general(
            s, w_mix, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (nb, t*t, v)
        dyn = dyn.reshape(nb, t, t, v).transpose(0, 3, 1, 2)  # (nb,v,t,u)
        adj = (dyn + brm_ref[k][None, :, None, None]) * alpha \
            + base_ref[k][None, None]                 # (nb, v, t, u)
        # per-joint temporal aggregation: batched over (nb, v)
        xf_v = xf.transpose(0, 2, 1, 3).reshape(nb * v, t, co)
        adj_v = adj.reshape(nb * v, t, t)
        if agg == "right":
            z = jax.lax.dot_general(
                adj_v, xf_v, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # out[u,c]=sum_t a[t,u]x[t,c]
        else:
            z = jax.lax.dot_general(
                adj_v, xf_v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # out[t,c]=sum_u a[t,u]x[u,c]
        acc += z.reshape(nb, v, t, co).transpose(0, 2, 1, 3)
    out_ref[:] = acc


def _pallas_forward(kernel_body, x, base, alpha, wf, bf, wm1, bm1, wm2, bm2,
                    wrm, brm, agg: str):
    n, t, v, cin = x.shape
    k = wf.shape[0]
    co = wf.shape[-1]
    nb = _block_samples(n)
    grid = (n // nb,)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    def vmem_full(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(kernel_body, num_kernels=k, agg=agg),
        out_shape=jax.ShapeDtypeStruct((n, t, v, co), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, t, v, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem_full(base), vmem_full(alpha_arr), vmem_full(wf),
            vmem_full(bf), vmem_full(wm1), vmem_full(bm1), vmem_full(wm2),
            vmem_full(bm2), vmem_full(wrm), vmem_full(brm),
        ],
        out_specs=pl.BlockSpec((nb, t, v, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        # CPU backend: semantics-checking interpreter (tests); TPU: Mosaic
        interpret=(jax.default_backend() != "tpu"),
    )(x.astype(jnp.float32), base, alpha_arr, wf, bf, wm1, bm1, wm2, bm2,
      wrm, brm)


def _make_op(kernel_body, oracle_fn):

    @functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
    def op(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
           mask=None, agg="right"):
        if mask is not None or not available():
            return oracle_fn(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2,
                             wrm, brm, mask, agg)
        return _pallas_forward(kernel_body, x, base, alpha, wf, bf, wm1,
                               bm1, wm2, bm2, wrm, brm, agg)

    def fwd(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm, mask, agg):
        out = op(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
                 mask, agg)
        return out, (x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm)

    def bwd(mask, agg, res, g):
        # exact gradients via the oracle formulation (XLA backward)
        def f(*args):
            return oracle_fn(*args, mask, agg)
        _, vjp = jax.vjp(f, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


dstd_spatial = _make_op(_spatial_kernel, oracle.dstd_spatial)
dstd_temporal = _make_op(_temporal_kernel, oracle.dstd_temporal)
