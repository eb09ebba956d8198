#!/usr/bin/env python
"""Probe round 3: minor-dims (sublane<->lane) transposes + the revised
flat-matmul spatial DSTD chain."""

import os
import sys

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

NB, T, VP, C, R = 4, 35, 24, 64, 2


def run(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"ok   {name}")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None


def main():
    rng = np.random.RandomState(0)

    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32))

    # P18: real minor-dims transpose on 3D
    run("P18 minor transpose 3D (B,24,40)->(B,40,24)",
        lambda i, o: o.__setitem__(slice(None), jnp.swapaxes(i[:], 1, 2)),
        (NB * VP, T, VP), mk(NB * VP, VP, T))

    # P19: 4D swap of dims 2,3 (sublane<->lane)
    run("P19 swapaxes(2,3) 4D",
        lambda i, o: o.__setitem__(slice(None), jnp.swapaxes(i[:], 2, 3)),
        (NB, VP, T, VP), mk(NB, VP, VP, T))

    # P20: revised spatial chain — direct-layout scores, one flat mixing
    # matmul, two swaps, batched aggregation dot
    def p20(q_ref, k_ref, w_ref, xf_ref, o):
        # scores directly in ((n), w, v, s) layout
        q2 = q_ref[:]                                   # (nb, 1, vp, t)
        k2 = k_ref[:]                                   # (nb, vp, 1, t)
        s = jnp.tanh(q2 - k2)                           # (nb, w, v, t)
        s_flat = s.reshape(NB * VP * VP, T)
        dyn = jnp.dot(s_flat, w_ref[:],
                      preferred_element_type=jnp.float32)   # (nb*w*v, To)
        adj = dyn.reshape(NB, VP, VP, T)
        adj = jnp.swapaxes(adj, 2, 3)                   # (nb, w, To, v)
        adj = jnp.swapaxes(adj, 1, 2)                   # (nb, To, w, v)
        adj_b = adj.reshape(NB * T, VP, VP)
        out = jax.lax.dot_general(
            adj_b, xf_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (nb*T, w, C)
        o[:] = out
    q = mk(NB, 1, VP, T)
    k = mk(NB, VP, 1, T)
    w = mk(T, T)
    xf = mk(NB * T, VP, C)
    got = run("P20 revised spatial chain", p20, (NB * T, VP, C), q, k, w, xf)
    if got is not None:
        s = np.tanh(np.asarray(q) - np.asarray(k))      # (nb, w, v, t)
        dyn = np.einsum("nwvs,st->ntwv", s, np.asarray(w))
        want = np.einsum("ntwv,ntvc->ntwc", dyn,
                         np.asarray(xf).reshape(NB, T, VP, C))
        err = np.abs(np.asarray(got).reshape(NB, T, VP, C) - want).max()
        print(f"     P20 max abs err vs numpy: {err:.3e}")

    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
