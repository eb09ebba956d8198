#!/usr/bin/env python
"""Round-3 probe: does the whole-chain fused kernel compile + win on chip?

Measures, with per-section retry on remote-compile HTTP 500 flakes:
  - xla_bd_bf16 baseline (round-2 winner, 5.165 ms)
  - dstd_chain at NB in {4, 8, 16}
  - per-op fused train step viability (compile only)
Prints one JSON line per section as it lands, so a timeout loses nothing.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dstdgcn_tpu/xla"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def retry(fn, tries=3):
    last = None
    for i in range(tries):
        try:
            return fn(), None
        except Exception as e:
            last = f"{type(e).__name__}: {str(e)[:200]}"
            log(retry=i, err=last)
            time.sleep(5)
    return None, last


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(device=str(jax.devices()[0]))

    import bench
    from dstdgcn_tpu.kernels import fused as fk

    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))
    cb = bench._chain_blocks(params)

    def timeit(name, op):
        sec, err = retry(lambda: bench._time_slope(op, x, 5, 25))
        log(section=name, ms=None if sec is None else round(sec * 1e3, 3),
            err=err)
        return sec

    timeit("xla_bd_bf16",
           lambda xx: bench.stacked_forward(params, xx, dtype=jnp.bfloat16,
                                            agg_group_s=5, agg_group_t=3))
    for nb in (4, 8, 16):
        os.environ["DSTDGCN_FUSED_NB"] = str(nb)
        timeit(f"chain_nb{nb}", lambda xx: fk.dstd_chain(xx, cb))
    os.environ["DSTDGCN_FUSED_NB"] = "4"

    # per-op fused fwd (round-2: 7.041 ms) for reference
    timeit("fused_per_op",
           lambda xx: bench.stacked_forward(params, xx, use_fused=True))

    # train step with pallas (compile + time, the round-2 HTTP 500 victim)
    sec, err = retry(lambda: bench.bench_train_step(128, True), tries=2)
    log(section="train_b128_pallas",
        ms=None if sec is None else round(sec * 1e3, 3), err=err)
    sec, err = retry(lambda: bench.bench_train_step(128, False), tries=1)
    log(section="train_b128_xla",
        ms=None if sec is None else round(sec * 1e3, 3), err=err)
    log(done=True)


if __name__ == "__main__":
    main()
