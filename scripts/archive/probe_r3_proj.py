#!/usr/bin/env python
"""Round-3 probe: merged q|k projection (one matmul, one pass over x) in
the XLA bd_bf16 formulation, with the unchanged chain_f32 kernel as a
cross-run noise anchor (the tunneled chip's absolute times vary ~20%
between processes; ratios within one process are stable).

Prior run (separate projections): xla_bd_bf16/chain_f32 = 5.201/5.541 =
0.94.  A ratio clearly below that is a real win.
"""

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

    run("chain_f32_anchor", lambda xx: fk.dstd_chain(xx, cb))
    run("xla_bd_bf16_mergedqk", lambda xx: bench.stacked_forward(
        params, xx, dtype=jnp.bfloat16, agg_group_s=5, agg_group_t=3))
    run("xla_f32_mergedqk", lambda xx: bench.stacked_forward(params, xx))
    if isinstance(out.get("xla_bd_bf16_mergedqk"), float) and \
            isinstance(out.get("chain_f32_anchor"), float):
        out["ratio_vs_anchor"] = round(
            out["xla_bd_bf16_mergedqk"] / out["chain_f32_anchor"], 4)
        out["prior_ratio_separate_proj"] = 0.9386
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
