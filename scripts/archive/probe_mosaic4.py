#!/usr/bin/env python
"""Probe round 4: time each fused-kernel STAGE in isolation on the chip
to find where the fused DSTD op spends its time.

Stages (spatial flagship shapes, N=128, T=35, Vp=24, C=64, R=2, K=2):
  dma_only   : copy x block in -> out (pipeline + DMA floor)
  proj       : x @ wf/wm1/wm2 matmuls only
  scores     : q/k swap chains + tanh + lane concat
  mix_flat   : the one flat mixing matmul
  rebatch    : the two adj transposes (sublane<->lane, major<->sublane)
  agg_dot    : the batched aggregation dot_general
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

N, NB, T, VP, C, R, K = 128, 4, 35, 24, 64, 2, 2


def timeit(fn, *args, iters=100):
    jf = jax.jit(fn)
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


def pcall(kernel, out_sd, in_arrs, in_block, out_block):
    return pl.pallas_call(
        kernel,
        out_shape=out_sd,
        grid=(N // NB,),
        in_specs=[pl.BlockSpec(b, lambda i, _n=len(b): (i,) + (0,) * (_n - 1),
                               memory_space=pltpu.VMEM)
                  if b[0] == NB else
                  pl.BlockSpec(b, lambda i, _n=len(b): (0,) * _n,
                               memory_space=pltpu.VMEM)
                  for b in in_block],
        out_specs=pl.BlockSpec(out_block,
                               lambda i, _n=len(out_block):
                               (i,) + (0,) * (_n - 1),
                               memory_space=pltpu.VMEM),
    )(*in_arrs)


def main():
    rng = np.random.RandomState(0)

    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)

    res = {}
    x = mk(N, T, VP, C)
    w3 = mk(K, C, C)

    # dma_only
    def k_dma(x_ref, o):
        o[:] = x_ref[:] * 2.0
    res["dma_only"] = timeit(lambda xx: pcall(
        k_dma, jax.ShapeDtypeStruct((N, T, VP, C), jnp.float32), [xx],
        [(NB, T, VP, C)], (NB, T, VP, C)), x)

    # proj: the 6 matmuls (xf, q, kk per 2 kernels)
    def k_proj(x_ref, w_ref, o):
        x2 = x_ref[:].reshape(NB * T * VP, C)
        acc = jnp.zeros((NB * T * VP, C), jnp.float32)
        for k in range(K):
            acc += jnp.dot(x2, w_ref[k], preferred_element_type=jnp.float32)
            for _ in range(2):
                acc += jnp.dot(x2, w_ref[k][:, :2],
                               preferred_element_type=jnp.float32
                               ).sum(-1, keepdims=True)
        o[:] = acc.reshape(NB, T, VP, C)
    res["proj"] = timeit(lambda xx: pcall(
        k_proj, jax.ShapeDtypeStruct((N, T, VP, C), jnp.float32), [xx, w3],
        [(NB, T, VP, C), (K, C, C)], (NB, T, VP, C)), x)

    # scores: q/k col extraction chains + tanh + concat (per k, r)
    q_rows = mk(N, T * VP, 2)

    def k_scores(q_ref, o):
        acc = None
        for k in range(K):
            svs = []
            for ri in range(R):
                q4 = q_ref[:][:, :, ri:ri + 1].reshape(NB, T, VP, 1)
                qv = jnp.swapaxes(jnp.swapaxes(q4, 1, 2), 2, 3)
                kv = jnp.swapaxes(jnp.swapaxes(q4 * 0.5, 1, 2), 2, 3)
                s = jnp.tanh(jnp.swapaxes(qv, 1, 2) - kv)
                svs.append(s)
            s_cat = jnp.concatenate(svs, axis=3)        # (NB, VP, VP, 2T)
            acc = s_cat if acc is None else acc + s_cat
        o[:] = acc
    res["scores"] = timeit(lambda qq: pcall(
        k_scores, jax.ShapeDtypeStruct((N, VP, VP, 2 * T), jnp.float32),
        [qq], [(NB, T * VP, 2)], (NB, VP, VP, 2 * T)), q_rows)

    # mix_flat: the one flat matmul per kernel
    s_in = mk(N, VP * VP, 2 * T)
    wrm = mk(2 * T, T)

    def k_mix(s_ref, w_ref, o):
        acc = None
        for k in range(K):
            d = jnp.dot(s_ref[:].reshape(NB * VP * VP, 2 * T), w_ref[:],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        o[:] = acc.reshape(NB, VP * VP, T)
    res["mix_flat"] = timeit(lambda ss: pcall(
        k_mix, jax.ShapeDtypeStruct((N, VP * VP, T), jnp.float32),
        [ss, wrm], [(NB, VP * VP, 2 * T), (2 * T, T)], (NB, VP * VP, T)),
        s_in)

    # rebatch: the two transposes, per kernel
    a_in = mk(N, VP, VP, T)

    def k_rebatch(a_ref, o):
        acc = None
        for k in range(K):
            a = jnp.swapaxes(jnp.swapaxes(a_ref[:], 2, 3), 1, 2)
            acc = a if acc is None else acc + a
        o[:] = acc
    res["rebatch"] = timeit(lambda aa: pcall(
        k_rebatch, jax.ShapeDtypeStruct((N, T, VP, VP), jnp.float32),
        [aa], [(NB, VP, VP, T)], (NB, T, VP, VP)), a_in)

    # agg_dot: one batched dot with k-concat shapes
    adj_in = mk(N, T, VP, K * VP)
    xf_in = mk(N, T, K * VP, C)

    def k_agg(adj_ref, xf_ref, o):
        adj = adj_ref[:].reshape(NB * T, VP, K * VP)
        xf = xf_ref[:].reshape(NB * T, K * VP, C)
        out = jax.lax.dot_general(
            adj, xf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o[:] = out.reshape(NB, T, VP, C)
    res["agg_dot"] = timeit(lambda a, b: pcall(
        k_agg, jax.ShapeDtypeStruct((N, T, VP, C), jnp.float32), [a, b],
        [(NB, T, VP, K * VP), (NB, T, K * VP, C)], (NB, T, VP, C)),
        adj_in, xf_in)

    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
