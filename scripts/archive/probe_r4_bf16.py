#!/usr/bin/env python
"""Round-3 probe: bf16 MXU dots + NB sweep for the whole-chain kernel.

BENCH at round-3 head: chain f32 nb4 = 5.51 ms vs xla_bd_bf16 = 5.164 ms.
The chain kernel's matmuls all run f32 (MXU issues bf16 at ~4x the f32
rate) and nb=4 gives 32 grid steps along the sample dim; this probe sweeps
in-kernel bf16 dots and nb in {4, 8, 16} to find the winning config, plus
the per-op fused kernels with bf16 dots and the pallas train step (fixed
import this time).  Prints one JSON line per section as it lands.
"""

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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from dstdgcn_tpu.kernels import fused as fk


def log(**kw):
    print(json.dumps(kw), flush=True)


def attempt(name, fn, tries=2):
    for i in range(tries):
        try:
            t0 = time.time()
            out = fn()
            log(section=name, ms=round(out * 1e3, 3),
                wall_s=round(time.time() - t0, 1))
            return out
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {str(e)[:160]}"
            if i + 1 == tries or not bench._flaky_compile(e):
                log(section=name, error=msg)
                return None
            log(section=name, retry=msg)
            time.sleep(10)


def main():
    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))
    cb = bench._chain_blocks(params)
    log(section="device", device=str(jax.devices()[0]))

    # correctness cross-check on chip: chain bf16 vs xla f32
    want = np.asarray(bench.stacked_forward(params, x))
    got = np.asarray(fk.dstd_chain(x, cb, "right", jnp.bfloat16, 8))
    rel = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-9))
    log(section="chain_bf16_nb8_relerr", relerr=round(rel, 5))

    attempt("xla_bd_bf16", lambda: bench._time_slope(
        lambda xx: bench.stacked_forward(params, xx, dtype=jnp.bfloat16,
                                         agg_group_s=5, agg_group_t=3), x))
    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        for nb in (4, 8, 16):
            attempt(f"chain_{tag}_nb{nb}", lambda d=dtype, b=nb:
                    bench._time_slope(
                        lambda xx: fk.dstd_chain(xx, cb, "right", d, b), x))
    # per-op fused with bf16 dots
    attempt("per_op_fused_bf16", lambda: bench._time_slope(
        lambda xx: bench.stacked_forward(params, xx, use_fused=True,
                                         dtype=jnp.bfloat16), x))
    # pallas train step (per-op fused fwd + hand-derived pallas bwd)
    attempt("train_b128_pallas", lambda: bench.bench_train_step(
        128, use_pallas=True))
    attempt("train_b128_pallas_bf16", lambda: bench.bench_train_step(
        128, use_pallas=True, compute_dtype="bfloat16"))


if __name__ == "__main__":
    main()
