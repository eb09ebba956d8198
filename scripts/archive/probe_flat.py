#!/usr/bin/env python
"""Time the 7-block DSTD forward with grid vs flat pair layouts on the chip.

The flat layout keeps the score/dyn intermediates packed on lanes
(V*V=484 / T*T=1225 minor) instead of the (8,128)-tiled pair grid whose
minor dim is 22/35 — see ops/dstd.py::_dyn_adjacency_flat.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dstdgcn_tpu/xla"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402  (reuse _naive_params and shapes)
from dstdgcn_tpu.ops import dstd as ops  # noqa: E402


def forward(params_list, x, dtype=None, pair_flat=False):
    for p in params_list:
        x = ops.dstd_spatial(x, p["base_s"], p["alpha_s"], p["wf_s"],
                             p["bf_s"], p["wm1_s"], p["bm1_s"], p["wm2_s"],
                             p["bm2_s"], p["wrm_s"], p["brm_s"],
                             dtype=dtype, pair_flat=pair_flat)
        x = ops.dstd_temporal(x, p["base_t"], p["alpha_t"], p["wf_t"],
                              p["bf_t"], p["wm1_t"], p["bm1_t"], p["wm2_t"],
                              p["bm2_t"], p["wrm_t"], p["brm_t"],
                              dtype=dtype, pair_flat=pair_flat)
    return x.astype(jnp.float32)


def main():
    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))
    res = {"device": str(jax.devices()[0])}

    variants = [
        ("grid_f32", None, False),
        ("flat_f32", None, True),
        ("grid_bf16", jnp.bfloat16, False),
        ("flat_bf16", jnp.bfloat16, True),
    ]
    for name, dt, fl in variants:
        tm = bench._time_looped(
            lambda xx, _dt=dt, _fl=fl: forward(params, xx, _dt, _fl),
            x, iters=30)
        res[name + "_ms"] = round(tm * 1e3, 3)
        print(json.dumps({name + "_ms": res[name + "_ms"]}), flush=True)

    # numeric check flat vs grid on the chip
    a = jax.jit(lambda xx: forward(params, xx))(x)
    b = jax.jit(lambda xx: forward(params, xx, pair_flat=True))(x)
    res["flat_vs_grid_maxabs"] = float(jnp.abs(a - b).max())
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
