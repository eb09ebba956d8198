#!/usr/bin/env python
"""Why does a Pallas identity copy of (128,35,22..24,64) cost 0.82 ms?

probe_mosaic9: the fused DSTD kernel's grid pipeline floor (out = in copy)
is ~12x the theoretical HBM round-trip (~67 us) and dominates the whole
kernel.  Suspects: the 64-wide (half-lane) minor dim, the 4-sample blocks
(tiny DMAs), missing parallel dimension semantics, or VMEM->VMEM copy cost.
This probe times copy kernels over layout/blocking variants plus an XLA
elementwise baseline.  Prints JSON (ms for the full 128-sample array).
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

INTERPRET = jax.default_backend() != "tpu"
N, T, V, C = 128, 35, 22, 64


def _time_looped(op, x0, iters=50):
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


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def addone_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def make_copy(shape, block, kern=copy_kernel, parallel=False, vp=None):
    """Copy kernel over `shape` with grid on the leading dim."""
    n = shape[0]
    nb = block[0]
    nd = len(shape)
    kw = {}
    if parallel:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))

    def idx(i):
        return (i,) + (0,) * (nd - 1)

    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            grid=(n // nb,),
            in_specs=[pl.BlockSpec(block, idx, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
            interpret=INTERPRET,
            **kw)(x)

    return f


def main():
    rng = np.random.RandomState(0)
    res = {"device": str(jax.devices()[0])}

    def run(name, fn, x):
        try:
            jax.block_until_ready(jax.jit(fn)(x))
            res[name] = round(_time_looped(fn, x) * 1e3, 3)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:130]}"
        print(json.dumps({name: res[name]}), flush=True)

    x4 = jnp.asarray(rng.randn(N, T, 24, C).astype(np.float32))
    xg = jnp.asarray(rng.randn(N, T, V, C).astype(np.float32))
    xf3 = jnp.asarray(rng.randn(N, T, V * C).astype(np.float32))   # 1408 lanes
    xf2 = jnp.asarray(rng.randn(N, T * V * C).astype(np.float32))  # flat rows

    # XLA baselines: how fast does XLA move the same bytes?
    run("xla_addone_4d", lambda x: x + 1.0, xg)
    run("xla_addone_flat3", lambda x: x + 1.0, xf3)

    # the shipping kernel's exact pipeline floor
    run("pal_4d_nb4", make_copy((N, T, 24, C), (4, T, 24, C)), x4)
    run("pal_4d_nb4_par",
        make_copy((N, T, 24, C), (4, T, 24, C), parallel=True), x4)
    run("pal_4d_nb8", make_copy((N, T, 24, C), (8, T, 24, C)), x4)
    run("pal_4d_nb16", make_copy((N, T, 24, C), (16, T, 24, C)), x4)
    run("pal_4d_nb4_addone",
        make_copy((N, T, 24, C), (4, T, 24, C), kern=addone_kernel), x4)

    # unpadded V=22 (minor dims (22, 64); HBM tile pads both)
    run("pal_4d_v22_nb4", make_copy((N, T, V, C), (4, T, V, C)), xg)

    # lane-dense 3D layout: last dim V*C = 1408 = 11 * 128
    run("pal_3d_flat_nb4", make_copy((N, T, V * C), (4, T, V * C)), xf3)
    run("pal_3d_flat_nb8", make_copy((N, T, V * C), (8, T, V * C)), xf3)
    run("pal_3d_flat_nb16", make_copy((N, T, V * C), (16, T, V * C)), xf3)
    run("pal_3d_flat_nb16_par",
        make_copy((N, T, V * C), (16, T, V * C), parallel=True), xf3)

    # fully flat 2D: rows = samples, lanes = T*V*C = 49280 (385 * 128)
    run("pal_2d_flat_nb4", make_copy((N, T * V * C), (4, T * V * C)), xf2)
    run("pal_2d_flat_nb16", make_copy((N, T * V * C), (16, T * V * C)), xf2)
    run("pal_2d_flat_nb32", make_copy((N, T * V * C), (32, T * V * C)), xf2)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
