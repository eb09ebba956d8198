#!/usr/bin/env python
"""Per-component timing of the DSTD-GC forward on the attached chip.

Times each stage of the XLA compute path (projections, SDDMM scores +
mixing, aggregation) in isolation with the fori_loop harness from bench.py,
in f32 and bf16, to locate where the 7 ms flagship forward goes before
investing in fused kernels.  Prints one JSON object.
"""

import json
import os
import sys
import time

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


def _time_looped(op, x0, iters=50):
    def f(x):
        def body(i, acc):
            # scalar-reduce so shape-changing ops still carry a dependency
            return acc + 0.0 * jnp.sum(op(acc))
        return jax.lax.fori_loop(0, iters, body, x)

    jf = jax.jit(f)
    jax.block_until_ready(jf(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    k, n, t, v, c, r = 2, 128, 35, 22, 64, 2
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    x = mk(n, t, v, c)
    wf, bf = mk(k, c, c), mk(k, c)
    wm1, bm1, wm2, bm2 = mk(k, c, r), mk(k, r), mk(k, c, r), mk(k, r)
    wrm_s, brm_s = mk(k, r, t, t), mk(k, t)
    wrm_t, brm_t = mk(1, r, v, v), mk(1, v)
    base_s = mk(k, v, v)
    base_t = mk(1, t, t)
    alpha = jnp.asarray(0.5)

    # fixed projections for isolating downstream stages
    xf_s = ops._project(x, wf, bf)
    q_s = ops._project(x, wm1, bm1)
    adj_s = ops.dyn_adjacency_spatial(x, wm1, bm1, wm2, bm2, wrm_s, brm_s)
    adj_s = adj_s * alpha + base_s[:, None, None]
    adj_t = ops.dyn_adjacency_temporal(x, wm1[:1], bm1[:1], wm2[:1], bm2[:1],
                                       wrm_t, brm_t)
    adj_t = adj_t * alpha + base_t[:, None, None]

    res = {}

    def probe(name, fn, x0):
        res[name] = round(_time_looped(fn, x0) * 1e3, 4)

    # stages, f32
    probe("proj_xf_s", lambda xx: ops._project(xx, wf, bf), x)
    probe("proj_qk_s", lambda xx: ops._project(xx, wm1, bm1)
          + ops._project(xx, wm2, bm2), x)
    probe("dyn_s(q,k fixed ok? uses x)", lambda xx: ops.dyn_adjacency_spatial(
        xx, wm1, bm1, wm2, bm2, wrm_s, brm_s), x)
    probe("agg_s(adj fixed)", lambda xx: ops.aggregate_spatial(
        ops._project(xx, wf, bf), adj_s), x)
    probe("agg_s_only", lambda aa: ops.aggregate_spatial(xf_s, aa), adj_s)
    probe("dstd_spatial_f32", lambda xx: ops.dstd_spatial(
        xx, base_s, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm_s, brm_s), x)
    probe("dstd_temporal_f32", lambda xx: ops.dstd_temporal(
        xx, base_t, alpha, wf[:1], bf[:1], wm1[:1], bm1[:1], wm2[:1],
        bm2[:1], wrm_t, brm_t), x)
    # bf16 compute path
    probe("dstd_spatial_bf16", lambda xx: ops.dstd_spatial(
        xx, base_s, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm_s, brm_s,
        dtype=jnp.bfloat16), x)
    probe("dstd_temporal_bf16", lambda xx: ops.dstd_temporal(
        xx, base_t, alpha, wf[:1], bf[:1], wm1[:1], bm1[:1], wm2[:1],
        bm2[:1], wrm_t, brm_t, dtype=jnp.bfloat16), x)

    # batch scaling of the full layer
    for nn in (256, 512):
        xb = mk(nn, t, v, c)
        probe(f"dstd_spatial_f32_n{nn}", lambda xx: ops.dstd_spatial(
            xx, base_s, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm_s, brm_s), xb)

    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
