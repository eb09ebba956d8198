#!/usr/bin/env python
"""Round-3 probe #2: grid-structured chain kernel + backward-kernel bisect.

Sections:
  - chain_nb{4,8} fwd (new grid design: block loop in the grid)
  - single-op fused spatial/temporal backward (isolates which Pallas
    program crashes tpu_compile_helper in the full pallas train step)
Prints one JSON line per section.
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


def attempt(name, fn, tries=2):
    last = None
    for i in range(tries):
        try:
            t0 = time.time()
            out = fn()
            log(section=name, ms=out, compile_s=round(time.time() - t0, 1))
            return out
        except Exception as e:
            last = f"{type(e).__name__}: {str(e)[:180]}"
            log(section=name, retry=i, err=last)
            time.sleep(5)
    log(section=name, ms=None, err=last)
    return None


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

    for nb in (4, 8):
        os.environ["DSTDGCN_FUSED_NB"] = str(nb)
        attempt(f"chain_grid_nb{nb}",
                lambda: round(bench._time_slope(
                    lambda xx: fk.dstd_chain(xx, cb), x, 5, 25) * 1e3, 3))
    os.environ["DSTDGCN_FUSED_NB"] = "4"

    # single-op backward kernels (fused_bwd) — compile + run in isolation
    p = params[0]
    sp_args = (p["base_s"], p["alpha_s"], p["wf_s"], p["bf_s"], p["wm1_s"],
               p["bm1_s"], p["wm2_s"], p["bm2_s"], p["wrm_s"], p["brm_s"])
    tm_args = (p["base_t"], p["alpha_t"], p["wf_t"], p["bf_t"], p["wm1_t"],
               p["bm1_t"], p["wm2_t"], p["bm2_t"], p["wrm_t"], p["brm_t"])

    def grad_op(op, args):
        f = jax.jit(jax.grad(lambda xx, aa: jnp.sum(op(xx, *aa) ** 2),
                             argnums=(0, 1)))
        gx, ga = f(x, args)
        jax.block_until_ready(gx)
        return float(jnp.sum(jnp.abs(gx)))

    attempt("spatial_bwd_kernel", lambda: grad_op(fk.dstd_spatial, sp_args))
    attempt("temporal_bwd_kernel", lambda: grad_op(fk.dstd_temporal, tm_args))

    # same but through the oracle-replay bwd (DSTDGCN_PALLAS_BWD=0)
    os.environ["DSTDGCN_PALLAS_BWD"] = "0"
    attempt("spatial_bwd_oracle", lambda: grad_op(fk.dstd_spatial, sp_args))
    os.environ.pop("DSTDGCN_PALLAS_BWD")
    log(done=True)


if __name__ == "__main__":
    main()
