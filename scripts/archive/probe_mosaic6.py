#!/usr/bin/env python
"""Bisect the Mosaic compile crash of the BD-aggregation Pallas kernel.

probe_agg.py's spatial_bd_pallas variants all die with an opaque remote
compile-helper HTTP 500 (Mosaic subprocess crash), including ablations with
no BD logic at all — so the culprit is a construct common to all of them.
This probe compiles one minimal kernel per suspicious construct:

  A  grid + full-array weight specs + UNUSED VMEM scratch
  B  + zeroing the scratch
  C  + diagonal slice write at lane offset 0
  D  + diagonal slice write at lane offset 32
  E  + batched dot_general reading the scratch
  F  row-merge reshape (nb*t*vp, co) -> (ng, g*vp, co)
  G  vp=32 x-block (vs the working kernel's 24)
  H  scratch via run_scoped instead of scratch_shapes
"""

import functools
import json
import os
import sys

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

NB, T, VP, C, G = 4, 35, 32, 64, 4
NG = NB * T // G   # 35


def make(kernel, with_scratch=True):
    n = 16
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(n, T, VP, C).astype(np.float32))
    kw = {}
    if with_scratch:
        kw["scratch_shapes"] = [pltpu.VMEM((NG, G * VP, G * VP),
                                           jnp.float32)]
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, T, VP, C), jnp.float32),
        grid=(n // NB,),
        in_specs=[pl.BlockSpec((NB, T, VP, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NB, T, VP, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
        **kw)
    return f, x


def kA(x_ref, o_ref, bd):
    o_ref[:] = x_ref[:] * 2.0


def kB(x_ref, o_ref, bd):
    bd[:] = jnp.zeros_like(bd)
    o_ref[:] = x_ref[:] * 2.0


def kC(x_ref, o_ref, bd):
    bd[:] = jnp.zeros_like(bd)
    bd[:, 0:VP, 0:VP] = x_ref[:].reshape(NB * T, VP, C)[:NG, :, :VP]
    o_ref[:] = x_ref[:] + bd[0, 0, 0]


def kD(x_ref, o_ref, bd):
    bd[:] = jnp.zeros_like(bd)
    a = x_ref[:].reshape(NB * T, VP, C)[:NG, :, :VP]
    for gi in range(G):
        bd[:, gi * VP:(gi + 1) * VP, gi * VP:(gi + 1) * VP] = a
    o_ref[:] = x_ref[:] + bd[0, 0, 0]


def kE(x_ref, o_ref, bd):
    bd[:] = jnp.zeros_like(bd)
    a = x_ref[:].reshape(NB * T, VP, C)[:NG, :, :VP]
    for gi in range(G):
        bd[:, gi * VP:(gi + 1) * VP, gi * VP:(gi + 1) * VP] = a
    xfg = x_ref[:].reshape(NG, G * VP, C)
    o = jax.lax.dot_general(bd[:], xfg, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.reshape(NB, T, VP, C)


def kF(x_ref, o_ref, bd):
    x2 = x_ref[:].reshape(NB * T * VP, C)
    xfg = x2.reshape(NG, G * VP, C)
    o_ref[:] = (xfg * 1.5).reshape(NB, T, VP, C)


def kG(x_ref, o_ref, bd):
    # mimic the working kernel's projection on a vp=32 block
    x2 = x_ref[:].reshape(NB * T * VP, C)
    w = jnp.full((C, C), 0.01, jnp.float32)
    y = jnp.dot(x2, w, preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(NB, T, VP, C)


def kH(x_ref, o_ref):
    def inner(bd):
        bd[:] = jnp.zeros_like(bd)
        o_ref[:] = x_ref[:] + bd[0, 0, 0]
    pl.run_scoped(inner, pltpu.VMEM((NG, G * VP, G * VP), jnp.float32))


def main():
    res = {}
    for name, kern, ws in [("A_unused_scratch", kA, True),
                           ("B_zero_scratch", kB, True),
                           ("C_slice_write_off0", kC, True),
                           ("D_slice_write_off32", kD, True),
                           ("E_dot_from_scratch", kE, True),
                           ("F_rowmerge_reshape", kF, True),
                           ("G_vp32_proj", kG, True),
                           ("H_run_scoped", kH, False)]:
        try:
            f, x = make(kern, with_scratch=ws)
            jax.block_until_ready(jax.jit(f)(x))
            res[name] = "OK"
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:120]}"
        print(json.dumps({name: res[name]}), flush=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
