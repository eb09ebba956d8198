#!/usr/bin/env python
"""Probe round 2: lane-merge/split relayouts for the wide-lane fused DSTD
kernel (see probe_mosaic.py for round 1)."""

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

NB, T, VP, C = 4, 35, 24, 64
VW = VP * VP


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
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.RandomState(0)

    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32))

    # P12: merge the two minormost dims (sublane*lane -> lane)
    run("P12 minor merge (nb,T,24,24)->(nb,T,576)",
        lambda i, o: o.__setitem__(slice(None),
                                   i[:].reshape(NB, T, VW)),
        (NB, T, VW), mk(NB, T, VP, VP))

    # P13: split lane dim into (sublane, lane)
    run("P13 lane split (B,576)->(B,24,24)",
        lambda i, o: o.__setitem__(slice(None),
                                   i[:].reshape(NB * T, VP, VP)),
        (NB * T, VP, VP), mk(NB * T, VW))

    # P14: concat along lane dim of 3D
    run("P14 lane concat",
        lambda i, o: o.__setitem__(
            slice(None), jnp.concatenate([i[:], i[:]], axis=2)),
        (NB * T, VP, 2 * VP), mk(NB * T, VP, VP))

    # P15: lane broadcast (.., V, 1) -> (.., V, W)
    run("P15 lane broadcast",
        lambda i, o: o.__setitem__(
            slice(None), jnp.broadcast_to(i[:], (NB, T, VP, VP)) * 1.0),
        (NB, T, VP, VP), mk(NB, T, VP, 1))

    # P16: sublane broadcast (.., 1, W) -> (.., V, W)
    run("P16 sublane broadcast",
        lambda i, o: o.__setitem__(
            slice(None), jnp.broadcast_to(i[:], (NB, T, VP, VP)) * 1.0),
        (NB, T, VP, VP), mk(NB, T, 1, VP))

    # P17: full wide-lane score construction + mix + split chain
    def p17(q_ref, k_ref, w_ref, o):
        qb = jnp.broadcast_to(q_ref[:], (NB, T, VP, VP)).reshape(NB, T, VW)
        kb = jnp.broadcast_to(k_ref[:], (NB, T, VP, VP)).reshape(NB, T, VW)
        s = jnp.tanh(qb - kb)                          # (NB, T, VW)
        wb = jnp.broadcast_to(w_ref[:][None], (NB, T, T))
        dyn = jax.lax.dot_general(
            wb, s, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (NB, T, VW)
        o[:] = dyn.reshape(NB * T, VP, VP)
    run("P17 wide chain", p17, (NB * T, VP, VP),
        mk(NB, T, VP, 1), mk(NB, T, 1, VP), mk(T, T))

    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
