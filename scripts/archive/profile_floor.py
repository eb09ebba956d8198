#!/usr/bin/env python
"""Separate harness floor from real per-op cost on the attached chip.

Times: a no-op, a single DSTD layer, and a 14-op chained forward — each in
the same fori_loop harness, f32 and bf16, n=128 and n=512.  The chained
number divided by op count is the true per-op cost (matches bench.py).
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


def _time_looped(op, x0, iters=30):
    def f(x):
        def body(i, acc):
            return op(acc)
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
    k, t, v, c, r = 2, 35, 22, 64, 2
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    a_s = [mk(k, v, v), jnp.asarray(0.5), mk(k, c, c), mk(k, c),
           mk(k, c, r), mk(k, r), mk(k, c, r), mk(k, r), mk(k, r, t, t),
           mk(k, t)]
    a_t = [mk(1, t, t), jnp.asarray(0.5), mk(1, c, c), mk(1, c),
           mk(1, c, r), mk(1, r), mk(1, c, r), mk(1, r), mk(1, r, v, v),
           mk(1, v)]

    def chain(dtype):
        def f(x):
            for _ in range(7):
                x = ops.dstd_spatial(x, *a_s, dtype=dtype)
                x = ops.dstd_temporal(x, *a_t, dtype=dtype)
            return x
        return f

    res = {}
    for n in (128, 512):
        x = mk(n, t, v, c)
        res[f"noop_n{n}"] = round(_time_looped(
            lambda xx: xx * 1.0001, x) * 1e3, 4)
        res[f"layer_f32_n{n}"] = round(_time_looped(
            lambda xx: ops.dstd_spatial(xx, *a_s), x) * 1e3, 4)
        res[f"chain14_f32_n{n}"] = round(
            _time_looped(chain(None), x) * 1e3, 3)
        res[f"chain14_bf16_n{n}"] = round(
            _time_looped(chain(jnp.bfloat16), x) * 1e3, 3)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
