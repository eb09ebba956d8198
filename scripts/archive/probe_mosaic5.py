#!/usr/bin/env python
"""Probe round 5: fused-op and aggregation scaling with block size NB.

Questions this answers (on the real chip):
  * is the fused DSTD op per-program-overhead bound (time flat in NB)?
  * which of spatial/temporal dominates the 10.3 ms fused forward?
  * does the batched aggregation dot_general get cheaper per sample
    with more batch elements per program?
  * what is the XLA oracle per-op time to beat?

Prints one JSON object.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dstdgcn_tpu/xla"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dstdgcn_tpu.kernels import fused  # noqa: E402
from dstdgcn_tpu.ops import dstd as ops  # noqa: E402

N, T, V, C, R, K = 128, 35, 22, 64, 2, 2


def emit(res, key, val):
    res[key] = val
    print(json.dumps({key: val}), flush=True)


def timeit(jf, *args, iters=50):
    out = jf(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def mkparams(rng):
    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
    return dict(
        base_s=mk(K, V, V), alpha=jnp.asarray(0.5),
        wf=mk(K, C, C), bf=mk(K, C),
        wm1=mk(K, C, R), bm1=mk(K, R), wm2=mk(K, C, R), bm2=mk(K, R),
        wrm_s=mk(K, R, T, T), brm_s=mk(K, T),
        base_t=mk(1, T, T),
        wf_t=mk(1, C, C), bf_t=mk(1, C),
        wm1_t=mk(1, C, R), bm1_t=mk(1, R), wm2_t=mk(1, C, R), bm2_t=mk(1, R),
        wrm_t=mk(1, R, V, V), brm_t=mk(1, V),
    )


def main():
    rng = np.random.RandomState(0)
    p = mkparams(rng)
    x = jnp.asarray(rng.randn(N, T, V, C).astype(np.float32))
    res = {"device": str(jax.devices()[0])}

    def spatial(xx):
        return fused.dstd_spatial(xx, p["base_s"], p["alpha"], p["wf"],
                                  p["bf"], p["wm1"], p["bm1"], p["wm2"],
                                  p["bm2"], p["wrm_s"], p["brm_s"])

    def temporal(xx):
        return fused.dstd_temporal(xx, p["base_t"], p["alpha"], p["wf_t"],
                                   p["bf_t"], p["wm1_t"], p["bm1_t"],
                                   p["wm2_t"], p["bm2_t"], p["wrm_t"],
                                   p["brm_t"])

    def o_spatial(xx):
        return ops.dstd_spatial(xx, p["base_s"], p["alpha"], p["wf"],
                                p["bf"], p["wm1"], p["bm1"], p["wm2"],
                                p["bm2"], p["wrm_s"], p["brm_s"])

    def o_temporal(xx):
        return ops.dstd_temporal(xx, p["base_t"], p["alpha"], p["wf_t"],
                                 p["bf_t"], p["wm1_t"], p["bm1_t"],
                                 p["wm2_t"], p["bm2_t"], p["wrm_t"],
                                 p["brm_t"])

    emit(res, "xla_spatial_ms", timeit(jax.jit(o_spatial), x))
    emit(res, "xla_temporal_ms", timeit(jax.jit(o_temporal), x))

    for nb in (2, 4, 8, 16, 32):
        os.environ["DSTDGCN_FUSED_NB"] = str(nb)
        # fused._block_samples reads the env var at trace time and jit
        # traces are cached by function identity — drop all caches so each
        # nb actually retraces (otherwise every nb re-times the first one).
        jax.clear_caches()
        for name, fn in (("spatial", spatial), ("temporal", temporal)):
            key = f"fused_{name}_nb{nb}_ms"
            try:
                emit(res, key, timeit(jax.jit(fn), x))
            except Exception as e:
                emit(res, key, f"{type(e).__name__}: {str(e)[:120]}")
    os.environ.pop("DSTDGCN_FUSED_NB", None)

    # batched aggregation dot scaling: (B, VP, K*VP) @ (B, K*VP, C)
    VP = 24
    for nb in (4, 8, 16, 32):
        adj = jnp.asarray(rng.randn(N, T, VP, K * VP).astype(np.float32))
        xf = jnp.asarray(rng.randn(N, T, K * VP, C).astype(np.float32))

        def k_agg(adj_ref, xf_ref, o):
            a = adj_ref[:].reshape(nb * T, VP, K * VP)
            b = xf_ref[:].reshape(nb * T, K * VP, C)
            out = jax.lax.dot_general(
                a, b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o[:] = out.reshape(nb, T, VP, C)

        def run(a, b, _nb=nb):
            return pl.pallas_call(
                k_agg,
                out_shape=jax.ShapeDtypeStruct((N, T, VP, C), jnp.float32),
                grid=(N // _nb,),
                in_specs=[
                    pl.BlockSpec((_nb, T, VP, K * VP),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_nb, T, K * VP, C),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((_nb, T, VP, C),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(a, b)

        try:
            emit(res, f"agg_dot_nb{nb}_ms", timeit(jax.jit(run), adj, xf))
        except Exception as e:
            emit(res, f"agg_dot_nb{nb}_ms", f"{type(e).__name__}: {str(e)[:120]}")

    # bf16 variant of the batched aggregation at nb=8
    adj16 = jnp.asarray(rng.randn(N, T, VP, K * VP).astype(np.float32)
                        ).astype(jnp.bfloat16)
    xf16 = jnp.asarray(rng.randn(N, T, K * VP, C).astype(np.float32)
                       ).astype(jnp.bfloat16)
    nb = 8

    def k_agg16(adj_ref, xf_ref, o):
        a = adj_ref[:].reshape(nb * T, VP, K * VP)
        b = xf_ref[:].reshape(nb * T, K * VP, C)
        out = jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o[:] = out.reshape(nb, T, VP, C).astype(jnp.bfloat16)

    def run16(a, b):
        return pl.pallas_call(
            k_agg16,
            out_shape=jax.ShapeDtypeStruct((N, T, VP, C), jnp.bfloat16),
            grid=(N // nb,),
            in_specs=[
                pl.BlockSpec((nb, T, VP, K * VP), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, T, K * VP, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nb, T, VP, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(a, b)

    try:
        emit(res, "agg_dot_nb8_bf16_ms", timeit(jax.jit(run16), adj16, xf16))
    except Exception as e:
        emit(res, "agg_dot_nb8_bf16_ms", f"{type(e).__name__}: {str(e)[:120]}")

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
