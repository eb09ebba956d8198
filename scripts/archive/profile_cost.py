#!/usr/bin/env python
"""XLA cost analysis of one DSTD layer: bytes accessed, flops, and the
implied bandwidth at the measured runtime, f32 vs bf16 flow."""

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

from dstdgcn_tpu.ops import dstd as ops  # noqa: E402


def _time_looped(op, x0, iters=50):
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
    k, n, t, v, c, r = 2, 128, 35, 22, 64, 2
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    x = mk(n, t, v, c)
    a_s = [mk(k, v, v), jnp.asarray(0.5), mk(k, c, c), mk(k, c),
           mk(k, c, r), mk(k, r), mk(k, c, r), mk(k, r), mk(k, r, t, t),
           mk(k, t)]

    res = {}
    for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        def op(xx, d=dtype):
            y = ops.dstd_spatial(xx, *a_s, dtype=d)
            return y.astype(jnp.float32)

        compiled = jax.jit(op).lower(x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ms = _time_looped(op, x) * 1e3
        ba = float(ca.get("bytes accessed", 0.0))
        res[name] = {
            "ms": round(ms, 4),
            "bytes_accessed_MB": round(ba / 1e6, 1),
            "flops_G": round(float(ca.get("flops", 0.0)) / 1e9, 2),
            "implied_GBps": round(ba / (ms / 1e3) / 1e9, 1),
            "transcendentals_M": round(
                float(ca.get("transcendentals", 0.0)) / 1e6, 1),
        }
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
