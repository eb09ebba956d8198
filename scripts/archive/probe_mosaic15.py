#!/usr/bin/env python
"""Does the temporal fused kernel need frame padding at all?

The temporal op pads T 35->40 "for tile-aligned row-group reshapes", but
every reshape involving T merges/splits MAJOR dims (row groups), which is
layout-free for any T; only V (a sublane dim in the row split) needs the
multiple-of-8 pad.  Dropping the T pad removes the per-op pad+slice dance
AND ~14-30% of every frame-dim computation (scores are T^2).  This probe
compiles/times/checks the unpadded-T temporal kernel and an unpadded-T
whole-chain kernel, plus the train-step with the Pallas backward (post
scalar-store fix).  Slope-timed; prints JSON.
"""

import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dstdgcn_tpu.kernels import fused  # noqa: E402
from dstdgcn_tpu.kernels.fused import (_pad_to, _stack_qk,  # noqa: E402
                                       _temporal_kernel, _prep_temporal)
from dstdgcn_tpu.ops import dstd as ops  # noqa: E402

INTERPRET = jax.default_backend() != "tpu"


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
    return (_loop(op, x0, i2) - _loop(op, x0, i1)) / (i2 - i1)


def temporal_nopad(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
                   nb=4):
    """fused temporal op with tp == t (no frame padding)."""
    n, t, v, cin = x.shape
    k, co = wf.shape[0], wf.shape[-1]
    red = wm1.shape[-1]
    vp = -(-v // 8) * 8
    x_p = _pad_to(x.astype(jnp.float32), 2, vp)
    base_p, wrm_p, brm_p = _prep_temporal(base, wrm, brm, vp, t, "right")
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    bf2 = bf[:, None, :]
    wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)

    def vmem_full(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_temporal_kernel, num_kernels=k, red=red,
                          agg="right", v_real=v, t_real=t),
        out_shape=jax.ShapeDtypeStruct((n, t, vp, co), jnp.float32),
        grid=(n // nb,),
        in_specs=[pl.BlockSpec((nb, t, vp, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  vmem_full(base_p), vmem_full(alpha_arr), vmem_full(wf),
                  vmem_full(bf2), vmem_full(wqk), vmem_full(bqk),
                  vmem_full(wrm_p), vmem_full(brm_p)],
        out_specs=pl.BlockSpec((nb, t, vp, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x_p, base_p, alpha_arr, wf, bf2, wqk, bqk, wrm_p, brm_p)
    return out[:, :, :v, :]


def main():
    k, t, v, c, r, n = 2, 35, 22, 64, 2, 128
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    a_t = [mk(1, t, t), jnp.asarray(0.5), mk(1, c, c), mk(1, c),
           mk(1, c, r), mk(1, r), mk(1, c, r), mk(1, r), mk(1, r, v, v),
           mk(1, v)]
    x = mk(n, t, v, c)
    res = {"device": str(jax.devices()[0])}
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
            res[name] = f"{type(e).__name__}: {str(e)[:130]}"
        print(json.dumps({name: res[name]}), flush=True)

    run("t_padded_cur", lambda xx: fused.dstd_temporal(xx, *a_t))
    run("t_nopad", lambda xx: temporal_nopad(xx, *a_t), ref_t, 1e-3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
