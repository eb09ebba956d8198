#!/usr/bin/env python
"""Stage-cost ablation of the XLA DSTD chain on the attached chip.

Times the 7-block (14-op) flagship chain with stages knocked out, to
locate where the ~6 ms goes (all variants keep the remaining stages'
outputs live in the carry so XLA cannot delete them):

  projonly     feature projection only (pure big-GEMM floor)
  scores       + q/k projections + pairwise tanh (consumed cheaply)
  nomix        + everything except the wrm mixing matmul
  noagg        + mixing (full dyn) but no aggregation
  nosddmm      aggregation with cheap per-(n,t) adjacency (no SDDMM/mix)
  nosddmm_bd   same but block-diagonal grouped aggregation
  full_grid    status quo
  full_bd      grouped aggregation (g_s=5, g_t=3)
  full_bd_s16  full, f32 weights, bf16 score pipeline only

Prints one JSON dict of ms per chain step.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dstdgcn_tpu/xla"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dstdgcn_tpu.ops import dstd as ops  # noqa: E402
from dstdgcn_tpu.utils.timing import time_looped  # noqa: E402


def ablated_spatial(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
                    mode, dtype=None, score_dtype=None, agg_group=None):
    """dstd_spatial with stages knocked out (see module docstring)."""
    sd = score_dtype or dtype
    nn, tt, vv = x.shape[0], x.shape[1], x.shape[2]
    kk, rr = wm1.shape[0], wm1.shape[-1]
    cast = lambda a, d: a if d is None else a.astype(d)  # noqa: E731
    xf = jnp.einsum("ntvc,kcd->kntvd", cast(x, dtype), cast(wf, dtype),
                    preferred_element_type=jnp.float32) \
        + bf[:, None, None, None, :]
    if mode == "projonly":
        return xf.sum(0)
    q = jnp.einsum("ntvc,kcr->knrtv", cast(x, sd), cast(wm1, sd),
                   preferred_element_type=jnp.float32) \
        + bm1[:, None, :, None, None]
    k = jnp.einsum("ntvc,kcr->knrtv", cast(x, sd), cast(wm2, sd),
                   preferred_element_type=jnp.float32) \
        + bm2[:, None, :, None, None]
    q = cast(q, sd).reshape(kk, nn, rr * tt, vv)
    k = cast(k, sd).reshape(kk, nn, rr * tt, vv)
    s = jnp.tanh(q[..., :, None] - k[..., None, :])    # (K,N,R*T,V,W)
    if mode == "scores":
        # consume scores without the mix matmul: reduce over src axis
        red = s.astype(jnp.float32).sum(2)             # (K,N,V,W)
        return xf.sum(0) + 1e-6 * red.sum(-1)[:, :, None, :, None].sum(0)
    dyn = jnp.einsum("knsvw,kst->kntvw", cast(s, sd),
                     cast(wrm.reshape(kk, rr * tt, tt), sd),
                     preferred_element_type=jnp.float32) \
        + brm[:, None, :, None, None]
    if mode == "noagg":
        return xf.sum(0) + 1e-6 * dyn.sum(-1)[..., None].sum(0)
    adj = dyn * alpha + base[:, None, None, :, :]
    adj = cast(adj, dtype)
    xf = cast(xf, dtype)
    if agg_group:
        return ops.aggregate_spatial_grouped(xf, adj, agg_group, "right",
                                             dtype)
    return ops.aggregate_spatial(xf, adj, "right", dtype)


def cheap_adj_spatial(x, base, alpha, wf, bf, agg_group=None, dtype=None):
    """Aggregation-only ablation: per-(n,t) adjacency built for ~free."""
    cast = lambda a, d: a if d is None else a.astype(d)  # noqa: E731
    xf = jnp.einsum("ntvc,kcd->kntvd", cast(x, dtype), cast(wf, dtype),
                    preferred_element_type=jnp.float32) \
        + bf[:, None, None, None, :]
    # per-(n,t,v) channel-0 outer bias: genuinely batch-varying, no SDDMM
    adj = base[:, None, None, :, :] + alpha * x[None, :, :, :, 0:1]
    adj = jnp.broadcast_to(adj, (base.shape[0],) + x.shape[:3]
                           + (base.shape[-1],))
    xf, adj = cast(xf, dtype), cast(adj, dtype)
    if agg_group:
        return ops.aggregate_spatial_grouped(xf, adj, agg_group, "right",
                                             dtype)
    return ops.aggregate_spatial(xf, adj, "right", dtype)


def main():
    k, t, v, c, r, n = 2, 35, 22, 64, 2, 128
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    a_s = [mk(k, v, v), jnp.asarray(0.5), mk(k, c, c), mk(k, c),
           mk(k, c, r), mk(k, r), mk(k, c, r), mk(k, r), mk(k, r, t, t),
           mk(k, t)]
    a_t = [mk(1, t, t), jnp.asarray(0.5), mk(1, c, c), mk(1, c),
           mk(1, c, r), mk(1, r), mk(1, c, r), mk(1, r), mk(1, r, v, v),
           mk(1, v)]
    x = mk(n, t, v, c)
    res = {"device": str(jax.devices()[0])}

    def chain_abl(mode, **kw):
        def f(xx):
            for _ in range(14):       # 14 spatial ablated ops ~ 7 blocks
                xx = ablated_spatial(xx, *a_s, mode=mode, **kw)
            return xx.astype(jnp.float32)
        return f

    def chain_full(dtype=None, score_dtype=None, gs=None, gt=None):
        def f(xx):
            for _ in range(7):
                xx = ablated_spatial(xx, *a_s, mode="full", dtype=dtype,
                                     score_dtype=score_dtype, agg_group=gs)
                xx = ops.dstd_temporal(xx, *a_t, dtype=dtype, agg_group=gt)
            return xx.astype(jnp.float32)
        return f

    def chain_cheap(agg_group=None, dtype=None):
        def f(xx):
            for _ in range(14):
                xx = cheap_adj_spatial(xx, a_s[0], a_s[1], a_s[2], a_s[3],
                                       agg_group=agg_group, dtype=dtype)
            return xx.astype(jnp.float32)
        return f

    def run(name, fn):
        try:
            res[name] = round(time_looped(fn, x) * 1e3, 3)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({name: res[name]}), flush=True)

    run("c14s_projonly", chain_abl("projonly"))
    run("c14s_scores", chain_abl("scores"))
    run("c14s_noagg", chain_abl("noagg"))
    run("c14s_full_grid", chain_abl("full"))
    run("c14s_full_bd5", chain_abl("full", agg_group=5))
    run("c14s_nosddmm_grid", chain_cheap())
    run("c14s_nosddmm_bd5", chain_cheap(agg_group=5))
    run("c14s_nosddmm_bd7", chain_cheap(agg_group=7))
    run("c14s_nosddmm_bd5_bf16", chain_cheap(agg_group=5,
                                             dtype=jnp.bfloat16))
    run("c14s_full_bd5_s16", chain_abl("full", agg_group=5,
                                       score_dtype=jnp.bfloat16))
    run("chain14_full_bd_s16",
        chain_full(score_dtype=jnp.bfloat16, gs=5, gt=3))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
