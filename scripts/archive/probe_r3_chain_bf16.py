#!/usr/bin/env python
"""Round-3 probe: chain kernel with in-kernel bf16 MXU dots vs the XLA
bd_bf16 winner, at two nb (samples-per-program) settings.

Timing = two-point fori_loop slope (bench.py:_time_slope) so the tunneled
chip's fixed dispatch cost cancels.  Prints one JSON object.
"""

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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from dstdgcn_tpu.kernels import fused as fk  # noqa: E402


def main():
    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    cb = bench._chain_blocks(params)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))

    out = {}

    def run(name, fn):
        try:
            sec = bench._with_retry(lambda: bench._time_slope(fn, x))
            out[name] = round(sec * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"{type(e).__name__}: {str(e)[:120]}"
        print(json.dumps(out), flush=True)

    run("xla_bd_bf16", lambda xx: bench.stacked_forward(
        params, xx, dtype=jnp.bfloat16, agg_group_s=5, agg_group_t=3))
    run("chain_f32", lambda xx: fk.dstd_chain(xx, cb))
    run("chain_bf16", lambda xx: fk.dstd_chain(xx, cb, dtype=jnp.bfloat16))
    run("chain_bf16_nb8", lambda xx: fk.dstd_chain(xx, cb,
                                                   dtype=jnp.bfloat16, nb=8))
    run("chain_bf16_nb16", lambda xx: fk.dstd_chain(xx, cb,
                                                    dtype=jnp.bfloat16,
                                                    nb=16))
    # numeric check: bf16 chain vs oracle chain (loose tol, bf16 inputs)
    ref = np.asarray(fk._chain_oracle(x, cb, "right"))
    got = np.asarray(fk.dstd_chain(x, cb, dtype=jnp.bfloat16))
    denom = np.abs(ref).mean() + 1e-6
    out["bf16_rel_err"] = round(float(np.abs(got - ref).mean() / denom), 5)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
