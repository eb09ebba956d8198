#!/usr/bin/env python
"""Probe: which Mosaic relayout primitives compile on this chip.

Each probe is a minimal pallas kernel exercising ONE layout operation the
fused DSTD kernel design depends on.  Run on the real TPU; prints
ok/FAIL per probe.  (CPU interpreter accepts everything, so run on TPU.)
"""

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

NB, T, TP, VP, C, RS = 8, 35, 40, 24, 64, 70


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
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.RandomState(0)

    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32))

    x4 = mk(NB, T, VP, VP)          # (nb, s, v, w)
    x4b = mk(NB, T, VP, 1)
    xflat = mk(NB * T * VP, C)
    q2 = mk(NB * T * VP, 4)
    s3 = mk(NB * VP, T, VP)
    w3 = mk(NB * VP, T, T)

    # P1: 4D transpose swapping major<->sublane, lane unchanged
    run("P1 swapaxes(1,2) 4D", lambda i, o: o.__setitem__(
        slice(None), jnp.swapaxes(i[:], 1, 2)), (NB, VP, T, VP), x4)

    # P2: minor-dims transpose (..., V, 1) -> (..., 1, V)
    run("P2 minor swap (2,3)", lambda i, o: o.__setitem__(
        slice(None), jnp.swapaxes(i[:], 2, 3)), (NB, T, 1, VP), x4b)

    # P3: tile-aligned merge/split of leading dims
    def p3(i, o):
        a = i[:].reshape(NB * T * VP, VP)
        o[:] = a.reshape(NB, T, VP, VP)
    run("P3 aligned reshape", p3, (NB, T, VP, VP), x4)

    # P4: batched 3D dot_general, contract minor dims
    def p4(a_ref, b_ref, o):
        o[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    run("P4 batched dot", p4, (NB * VP, T, VP), w3, s3)

    # P5: broadcast_to over new leading dim
    def p5(a_ref, o):
        o[:] = jnp.broadcast_to(a_ref[:][None], (NB, T, VP, VP)) * 1.0
    run("P5 broadcast_to leading", p5, (NB, T, VP, VP), mk(T, VP, VP))

    # P6: concat along sublane dim of 4D
    def p6(a_ref, o):
        o[:] = jnp.concatenate([a_ref[:], a_ref[:]], axis=2)
    run("P6 sublane concat", p6, (NB, T, 2 * VP, 1), x4b)

    # P7: static unit lane slice at odd offset
    def p7(a_ref, o):
        o[:] = a_ref[:][:, 1:2]
    run("P7 unit lane slice", p7, (NB * T * VP, 1), q2)

    # P8: broadcast-subtract tanh (pairwise scores)
    def p8(a_ref, b_ref, o):
        o[:] = jnp.tanh(a_ref[:] - jnp.swapaxes(b_ref[:], 2, 3))
    run("P8 pairwise tanh", p8, (NB, T, VP, VP), x4b, x4b)

    # P9: 2D matmul from flat block + reshape chain
    def p9(a_ref, w_ref, o):
        y = jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        o[:] = y.reshape(NB * T, VP, C)
    run("P9 matmul+split", p9, (NB * T, VP, C), xflat, mk(C, C))

    # P10: padded-T variant of P1 (TP=40 frames)
    x4p = mk(NB, TP, VP, VP)
    run("P10 swapaxes(1,2) TP", lambda i, o: o.__setitem__(
        slice(None), jnp.swapaxes(i[:], 1, 2)), (NB, VP, TP, VP), x4p)

    # P11: iota-based row mask multiply
    def p11(a_ref, o):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB * T * VP, C), 0)
        o[:] = a_ref[:] * jnp.where((rows % VP) < 22, 1.0, 0.0)
    run("P11 iota row mask", p11, (NB * T * VP, C), xflat)

    print("device:", jax.devices()[0])


if __name__ == "__main__":
    main()
