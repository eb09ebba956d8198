#!/usr/bin/env python
"""Round-3 probe: does batch 256 raise edges/s/chip over the batch-128
flagship shape?  Measures the reference-style baseline and the bd_bf16
winner at both batches in ONE process (ratios are noise-stable)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dstdgcn_tpu/xla"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402


def main():
    t, v, c, blocks = 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    out = {}
    for n in (128, 256):
        x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))
        xc = jnp.transpose(x, (0, 3, 1, 2))
        edges = bench._edges_per_forward(n, t, v, blocks)
        for name, fn, x0 in (
            ("naive", lambda xx: bench.naive_reference_forward(params, xx),
             xc),
            ("bd_bf16", lambda xx: bench.stacked_forward(
                params, xx, dtype=jnp.bfloat16, agg_group_s=5,
                agg_group_t=3), x),
        ):
            try:
                sec = bench._with_retry(
                    lambda: bench._time_slope(fn, x0))
                out[f"{name}_n{n}_ms"] = round(sec * 1e3, 3)
                out[f"{name}_n{n}_edges_per_s"] = round(edges / sec / 1e9, 3)
            except Exception as e:  # noqa: BLE001
                out[f"{name}_n{n}_ms"] = f"{type(e).__name__}: {str(e)[:90]}"
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
