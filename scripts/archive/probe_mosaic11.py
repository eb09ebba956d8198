#!/usr/bin/env python
"""Harness sanity + true pipeline floor for the fused DSTD kernels.

probe_mosaic10 reported ~0.001 ms for EVERY copy variant including a plain
XLA x+1 on 110 MB — physically impossible, so the fori_loop harness folded
or cached something.  This probe:

  1. validates the harness: x+1 iterated K times must return x+K and scale
     linearly in K;
  2. re-times the pure Pallas copy, the pad->copy->slice dance
     (probe_mosaic9's floor), and a padded-interface fused spatial op with
     both the fori_loop harness and a dispatch-per-iteration harness;
  3. times a 14-op padded-interface chain (pad once, slice once).

Prints JSON.
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

from scripts.probe_mosaic9 import spatial, _kernel, _pad_to, _vmem_full  # noqa: E402,F401
from dstdgcn_tpu.ops import dstd as ops  # noqa: E402

INTERPRET = jax.default_backend() != "tpu"
N, T, V, C = 128, 35, 22, 64


def time_loop(op, x0, iters):
    """fori_loop harness (per-op seconds)."""
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


def time_dispatch(op, x0, iters=20):
    """dispatch-per-iteration harness (per-op seconds)."""
    jop = jax.jit(op)
    jax.block_until_ready(jop(x0))
    t0 = time.perf_counter()
    y = x0
    for _ in range(iters):
        y = jop(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def copy_pallas(x, nb=4):
    shape = x.shape
    nd = len(shape)
    block = (nb,) + shape[1:]

    def idx(i, _nd=nd):
        return (i,) + (0,) * (_nd - 1)

    return pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:]),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        grid=(shape[0] // nb,),
        in_specs=[pl.BlockSpec(block, idx, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        interpret=INTERPRET)(x)


def spatial_padded(x_p, args, nb=4, mode="full"):
    """Padded-interface fused spatial op: (N, T, 24, C) -> same (no host
    pad/slice; the kernel's own row mask keeps padded joints zero)."""
    base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = args
    n, t, vp, cin = x_p.shape
    k, co = wf.shape[0], wf.shape[-1]
    base_p = jnp.swapaxes(_pad_to(_pad_to(base, 1, vp), 2, vp), 1, 2)
    base_p = base_p[..., None]
    wrm2 = wrm.reshape(k, wrm.shape[1] * wrm.shape[2], wrm.shape[3])
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    bf2, bm12, bm22 = bf[:, None, :], bm1[:, None, :], bm2[:, None, :]
    brm_p = brm[:, None, None, :]
    return pl.pallas_call(
        functools.partial(_kernel, num_kernels=k, v_real=V, mode=mode),
        out_shape=jax.ShapeDtypeStruct((n, t, vp, co), jnp.float32),
        grid=(n // nb,),
        in_specs=[pl.BlockSpec((nb, t, vp, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  _vmem_full(base_p), _vmem_full(alpha_arr), _vmem_full(wf),
                  _vmem_full(bf2), _vmem_full(wm1), _vmem_full(bm12),
                  _vmem_full(wm2), _vmem_full(bm22), _vmem_full(wrm2),
                  _vmem_full(brm_p)],
        out_specs=pl.BlockSpec((nb, t, vp, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x_p, base_p, alpha_arr, wf, bf2, wm1, bm12, wm2, bm22, wrm2, brm_p)


def main():
    rng = np.random.RandomState(0)
    res = {"device": str(jax.devices()[0])}

    def put(name, val):
        res[name] = val
        print(json.dumps({name: val}), flush=True)

    x = jnp.asarray(rng.randn(N, T, V, C).astype(np.float32))
    x_p = _pad_to(x, 2, 24)

    # 1. harness sanity: x+1 iterated K times
    addone = lambda a: a + 1.0
    y10 = jax.jit(lambda a: jax.lax.fori_loop(0, 10, lambda i, b: b + 1.0,
                                              a))(x)
    put("sanity_value_ok", bool(np.allclose(np.asarray(y10[0, 0, 0, :2]),
                                            np.asarray(x[0, 0, 0, :2]) + 10)))
    for iters in (10, 50, 200):
        t = time_loop(addone, x, iters)
        put(f"xla_addone_loop{iters}_ms", round(t * 1e3, 4))
    put("xla_addone_dispatch_ms", round(time_dispatch(addone, x) * 1e3, 4))

    # 2. copies
    put("pal_copy_loop_ms", round(time_loop(copy_pallas, x_p, 30) * 1e3, 4))
    put("pal_copy_dispatch_ms",
        round(time_dispatch(copy_pallas, x_p) * 1e3, 4))

    def pad_copy_slice(a):
        return copy_pallas(_pad_to(a, 2, 24))[:, :, :V, :]

    put("pal_padcopyslice_loop_ms",
        round(time_loop(pad_copy_slice, x, 30) * 1e3, 4))

    # 3. fused spatial op, padded interface vs pad/slice interface
    k, r = 2, 2
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
    a_s = (mk(k, V, V), jnp.asarray(0.5), mk(k, C, C), mk(k, C),
           mk(k, C, r), mk(k, r), mk(k, C, r), mk(k, r), mk(k, r, T, T),
           mk(k, T))
    ref = np.asarray(jax.jit(lambda xx: ops.dstd_spatial(xx, *a_s))(x))
    got = np.asarray(jax.jit(
        lambda xp: spatial_padded(xp, a_s))(x_p))[:, :, :V, :]
    put("s_padded_maxerr", round(float(np.abs(got - ref).max()), 6))
    for mode in ("copy", "full"):
        t = time_loop(lambda xp, m=mode: spatial_padded(xp, a_s, mode=m),
                      x_p, 30)
        put(f"s_padded_{mode}_loop_ms", round(t * 1e3, 4))
    put("s_unpadded_full_loop_ms",
        round(time_loop(lambda xx: spatial(xx, *a_s, mode="full"), x, 30)
              * 1e3, 4))

    # 4. padded-interface 14-op chain (spatial only x14 as a proxy: same
    # cost class; pad once, slice once)
    def chain14_padded(xx):
        xp = _pad_to(xx, 2, 24)
        for _ in range(14):
            xp = spatial_padded(xp, a_s)
        return xp[:, :, :V, :]

    def chain14_unpadded(xx):
        for _ in range(14):
            xx = spatial(xx, *a_s, mode="full")
        return xx

    put("chain14s_padded_ms",
        round(time_loop(chain14_padded, x, 5) * 1e3, 3))
    put("chain14s_unpadded_ms",
        round(time_loop(chain14_unpadded, x, 5) * 1e3, 3))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
