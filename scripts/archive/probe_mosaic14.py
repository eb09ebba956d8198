#!/usr/bin/env python
"""Time the whole-chain fused DSTD kernel on the real chip.

The per-op fused kernels are pipeline-bound (probe_mosaic13): pad + DMA +
slice costs ~0.6 ms of every ~0.85 ms (spatial, temporal) pair.
fused.dstd_chain pays that once for the whole 7-block chain.  Slope-timed
(two iteration counts) against the XLA formulations.  Prints JSON.
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


def time_slope(op, x0, i1=5, i2=25):
    t1 = _loop(op, x0, i1)
    t2 = _loop(op, x0, i2)
    return (t2 - t1) / (i2 - i1)


def main():
    k, t, v, c, r, n = 2, 35, 22, 64, 2, 128
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    blocks = []
    for _ in range(7):
        a_s = (mk(k, v, v), jnp.asarray(0.5), mk(k, c, c), mk(k, c),
               mk(k, c, r), mk(k, r), mk(k, c, r), mk(k, r), mk(k, r, t, t),
               mk(k, t))
        a_t = (mk(1, t, t), jnp.asarray(0.5), mk(1, c, c), mk(1, c),
               mk(1, c, r), mk(1, r), mk(1, c, r), mk(1, r), mk(1, r, v, v),
               mk(1, v))
        blocks.append((a_s, a_t))
    x = mk(n, t, v, c)
    res = {"device": str(jax.devices()[0])}

    ref = np.asarray(jax.jit(
        lambda xx: fused._chain_oracle(xx, blocks, "right"))(x))

    def run(name, fn, check=False, atol=None):
        try:
            if check:
                got = np.asarray(jax.jit(fn)(x))
                err = float(np.abs(got - ref).max())
                res[name + "_maxerr"] = round(err, 6)
                if atol is not None and err > atol:
                    res[name] = f"WRONG (err {err})"
                    print(json.dumps({name: res[name]}), flush=True)
                    return
            res[name] = round(time_slope(fn, x) * 1e3, 4)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:150]}"
        print(json.dumps({name: res[name]}), flush=True)

    run("chain7b_fused_one_kernel",
        lambda xx: fused.dstd_chain(xx, blocks), check=True, atol=1e-2)
    run("chain7b_xla_grid",
        lambda xx: fused._chain_oracle(xx, blocks, "right"))

    def xla_bd_bf16(xx):
        for a_s, a_t in blocks:
            xx = ops.dstd_spatial(xx, *a_s, dtype=jnp.bfloat16, agg_group=5)
            xx = ops.dstd_temporal(xx, *a_t, dtype=jnp.bfloat16, agg_group=3)
        return xx.astype(jnp.float32)

    run("chain7b_xla_bd_bf16", xla_bd_bf16)

    def per_op_fused(xx):
        for a_s, a_t in blocks:
            xx = fused.dstd_spatial(xx, *a_s)
            xx = fused.dstd_temporal(xx, *a_t)
        return xx

    run("chain7b_fused_per_op", per_op_fused)

    for nb in (8, 16):
        os.environ["DSTDGCN_FUSED_NB"] = str(nb)
        jax.clear_caches()
        run(f"chain7b_fused_one_kernel_nb{nb}",
            lambda xx: fused.dstd_chain(xx, blocks), check=True, atol=1e-2)
    os.environ.pop("DSTDGCN_FUSED_NB", None)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
