#!/usr/bin/env python
"""Validate + time the fused Pallas DSTD kernels on the attached chip.

Compares fused vs the XLA oracle numerically (real TPU, not interpreter)
and reports per-op and full-forward times.  Prints one JSON object.
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


def _time_looped(op, x0, iters=30):
    """Output-carried loop (the ``acc + 0.0 * op(acc)`` pattern is
    algebraically folded away by XLA — see bench.py's slope timer)."""
    def f(x):
        return jax.lax.fori_loop(0, iters, lambda i, acc: op(acc), x)

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
    args_s = dict(base=mk(k, v, v), alpha=jnp.asarray(0.5),
                  wf=mk(k, c, c), bf=mk(k, c), wm1=mk(k, c, r),
                  bm1=mk(k, r), wm2=mk(k, c, r), bm2=mk(k, r),
                  wrm=mk(k, r, t, t), brm=mk(k, t))
    args_t = dict(base=mk(1, t, t), alpha=jnp.asarray(0.5),
                  wf=mk(1, c, c), bf=mk(1, c), wm1=mk(1, c, r),
                  bm1=mk(1, r), wm2=mk(1, c, r), bm2=mk(1, r),
                  wrm=mk(1, r, v, v), brm=mk(1, v))

    res = {"fused_available": fused.available(),
           "nb": int(os.environ.get("DSTDGCN_FUSED_NB", "4"))}

    for name, fn_f, fn_o, aa in (
            ("spatial", fused.dstd_spatial, ops.dstd_spatial, args_s),
            ("temporal", fused.dstd_temporal, ops.dstd_temporal, args_t)):
        a = list(aa.values())
        got = jax.jit(lambda xx, fn=fn_f, a=a: fn(xx, *a))(x)
        want = jax.jit(lambda xx, fn=fn_o, a=a: fn(xx, *a))(x)
        err = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        res[f"{name}_rel_err"] = err
        res[f"{name}_fused_ms"] = round(_time_looped(
            lambda xx, fn=fn_f, a=a: fn(xx, *a), x) * 1e3, 4)
        res[f"{name}_oracle_ms"] = round(_time_looped(
            lambda xx, fn=fn_o, a=a: fn(xx, *a), x) * 1e3, 4)

    # full 7-block forward, fused vs oracle
    def fwd(fn_s, fn_t):
        def f(xx):
            for _ in range(7):
                xx = fn_s(xx, *list(args_s.values()))
                xx = fn_t(xx, *list(args_t.values()))
            return xx
        return f

    res["forward7_fused_ms"] = round(_time_looped(
        fwd(fused.dstd_spatial, fused.dstd_temporal), x) * 1e3, 3)
    res["forward7_oracle_ms"] = round(_time_looped(
        fwd(ops.dstd_spatial, ops.dstd_temporal), x) * 1e3, 3)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
