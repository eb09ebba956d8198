#!/usr/bin/env python
"""Bisect the Mosaic crash in the paired-lane score path.

Each section compiles a tiny kernel exercising ONE suspect op at the
flagship block shapes (nb=4, tp=40, vp=24, K2R=8):

  cat_slices   : lane-concat of two slices of a transposed qk panel
  cat_fresh    : lane-concat of two freshly-computed arrays (control)
  pair_tanh    : paired broadcast tanh (nb, vp, vp, 80)
  pair_mix     : + (2304, 80) @ (80, 40) matmul
  proj_slice   : merged projection + lane slice at 64
  perm4        : jnp.transpose((nb, vp, vp, tp), (0, 3, 1, 2))   (control)
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dstdgcn_tpu/xla"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(**kw):
    print(json.dumps(kw), flush=True)


NB, TP, VP, K2R, CO = 4, 40, 24, 8, 64


def run(name, body, out_shape):
    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = body(x_ref[:], w_ref[:])

    x = jnp.asarray(np.random.RandomState(0)
                    .randn(NB, TP, VP, CO).astype(np.float32))
    w = jnp.asarray(np.random.RandomState(1)
                    .randn(CO, 128).astype(np.float32))
    try:
        t0 = time.time()
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)
        jax.block_until_ready(out)
        log(section=name, ok=True, wall_s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        log(section=name, error=f"{type(e).__name__}: {str(e)[:120]}")


def qk_t_of(x):
    qk = x.reshape(NB * TP * VP, CO)[:, :K2R]
    qk4 = qk.reshape(NB, TP, VP, K2R)
    return jnp.swapaxes(jnp.swapaxes(qk4, 1, 2), 2, 3)   # (NB, VP, K2R, TP)


def main():
    log(device=str(jax.devices()[0]))

    def cat_slices(x, w):
        qk_t = qk_t_of(x)
        qp = jnp.concatenate([qk_t[:, :, 0, :], qk_t[:, :, 1, :]], axis=-1)
        return qp                                         # (NB, VP, 80)
    run("cat_slices", cat_slices, (NB, VP, 2 * TP))

    # control: concat of two freshly materialized (NB, VP, TP) arrays
    def cat_fresh2(x, w):
        a = jnp.swapaxes(jnp.sum(x, axis=-1), 1, 2)       # (NB, VP, TP)
        b = a * 2.0
        return jnp.concatenate([a, b], axis=-1)
    run("cat_fresh", cat_fresh2, (NB, VP, 2 * TP))

    def pair_tanh(x, w):
        qk_t = qk_t_of(x)
        qp = jnp.concatenate([qk_t[:, :, 0, :], qk_t[:, :, 1, :]], axis=-1)
        kp = jnp.concatenate([qk_t[:, :, 2, :], qk_t[:, :, 3, :]], axis=-1)
        s = jnp.tanh(qp[:, None, :, :] - kp[:, :, None, :])
        return jnp.sum(s, axis=-1)                        # (NB, VP, VP)
    run("pair_tanh", pair_tanh, (NB, VP, VP))

    def pair_mix(x, w):
        qk_t = qk_t_of(x)
        qp = jnp.concatenate([qk_t[:, :, 0, :], qk_t[:, :, 1, :]], axis=-1)
        kp = jnp.concatenate([qk_t[:, :, 2, :], qk_t[:, :, 3, :]], axis=-1)
        s = jnp.tanh(qp[:, None, :, :] - kp[:, :, None, :])
        d = jnp.dot(s.reshape(NB * VP * VP, 2 * TP), w[:2 * TP, :TP],
                    preferred_element_type=jnp.float32)
        return d.reshape(NB, VP, VP, TP)
    run("pair_mix", pair_mix, (NB, VP, VP, TP))

    def proj_slice(x, w):
        x2 = x.reshape(NB * TP * VP, CO)
        xfp = jnp.dot(x2, w, preferred_element_type=jnp.float32)
        xf0 = xfp[:, :CO]
        xf1 = xfp[:, CO:]
        return (xf0 + xf1).reshape(NB, TP, VP, CO)
    run("proj_slice", proj_slice, (NB, TP, VP, CO))

    # transpose control at the real shape (NB, VP, VP, TP)->(NB, TP, VP, VP)
    def perm4c(x, w):
        a = x[:, :VP, :VP, :TP]                            # (NB, VP, VP, TP)
        return jnp.transpose(a, (0, 3, 1, 2))
    run("perm4", perm4c, (NB, TP, VP, VP))
    log(done=True)


if __name__ == "__main__":
    main()
