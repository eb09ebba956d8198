#!/usr/bin/env python
"""Overhead-corrected timing of the rewritten fused DSTD kernels.

probe_mosaic11 found the fori_loop timing harness carries a ~20 ms fixed
dispatch cost through the axon tunnel, inflating 30-iteration per-op
numbers by ~0.6 ms.  This probe times each variant at TWO iteration counts
and reports the slope (T2-T1)/(i2-i1) — the true marginal per-op device
time — for the new fused kernels (stacked q/k panel + factorized mixing),
the old-style numbers being in probe_mosaic9/BENCH_r01.

Prints JSON with per-op ms and 14-op chain ms.
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

from dstdgcn_tpu.kernels import fused  # noqa: E402
from dstdgcn_tpu.ops import dstd as ops  # noqa: E402


def _loop(op, x0, iters):
    def f(x):
        return jax.lax.fori_loop(0, iters, lambda i, acc: op(acc), x)

    jf = jax.jit(f)
    jax.block_until_ready(jf(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def time_slope(op, x0, i1=10, i2=60):
    """Marginal per-op seconds: fixed dispatch overhead cancels."""
    t1 = _loop(op, x0, i1)
    t2 = _loop(op, x0, i2)
    return (t2 - t1) / (i2 - i1)


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

    ref_s = np.asarray(jax.jit(lambda xx: ops.dstd_spatial(xx, *a_s))(x))
    ref_t = np.asarray(jax.jit(lambda xx: ops.dstd_temporal(xx, *a_t))(x))

    def run(name, fn, check_against=None, atol=None):
        try:
            if check_against is not None:
                got = np.asarray(jax.jit(fn)(x))
                err = float(np.abs(got - check_against).max())
                res[name + "_maxerr"] = round(err, 6)
                if atol is not None and err > atol:
                    res[name] = f"WRONG (err {err})"
                    print(json.dumps({name: res[name]}), flush=True)
                    return
            res[name] = round(time_slope(fn, x) * 1e3, 4)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:150]}"
        print(json.dumps({name: res[name]}), flush=True)

    run("s_new", lambda xx: fused.dstd_spatial(xx, *a_s), ref_s, 1e-3)
    run("t_new", lambda xx: fused.dstd_temporal(xx, *a_t), ref_t, 1e-3)
    run("s_xla", lambda xx: ops.dstd_spatial(xx, *a_s))
    run("t_xla", lambda xx: ops.dstd_temporal(xx, *a_t))

    os.environ["DSTDGCN_FUSED_NB"] = "8"
    jax.clear_caches()
    run("s_new_nb8", lambda xx: fused.dstd_spatial(xx, *a_s), ref_s, 1e-3)
    run("t_new_nb8", lambda xx: fused.dstd_temporal(xx, *a_t), ref_t, 1e-3)
    os.environ["DSTDGCN_FUSED_NB"] = "16"
    jax.clear_caches()
    run("s_new_nb16", lambda xx: fused.dstd_spatial(xx, *a_s), ref_s, 1e-3)
    del os.environ["DSTDGCN_FUSED_NB"]
    jax.clear_caches()

    def chain(sfn, tfn):
        def f(xx):
            for _ in range(7):
                xx = sfn(xx)
                xx = tfn(xx)
            return xx.astype(jnp.float32)
        return f

    run("chain14_new_fused",
        chain(lambda xx: fused.dstd_spatial(xx, *a_s),
              lambda xx: fused.dstd_temporal(xx, *a_t)))
    run("chain14_xla_grid",
        chain(lambda xx: ops.dstd_spatial(xx, *a_s),
              lambda xx: ops.dstd_temporal(xx, *a_t)))
    run("chain14_xla_bd_bf16",
        chain(lambda xx: ops.dstd_spatial(xx, *a_s, dtype=jnp.bfloat16,
                                          agg_group=5),
              lambda xx: ops.dstd_temporal(xx, *a_t, dtype=jnp.bfloat16,
                                           agg_group=3)))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
