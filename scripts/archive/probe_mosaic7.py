#!/usr/bin/env python
"""Second-stage bisect: the full BD spatial kernel vs stepwise ablations.

probe_mosaic6 showed every isolated construct compiles; this re-runs the
exact failing probe_agg.spatial_bd_pallas variants plus body ablations to
find the poison combination (or confirm the earlier failures were a
transient remote-compile-service outage).
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

from scripts.probe_agg import spatial_bd_pallas  # noqa: E402
from dstdgcn_tpu.ops import dstd as ops  # noqa: E402


def main():
    k, t, v, c, r, n = 2, 35, 22, 64, 2, 16
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    a_s = [mk(k, v, v), jnp.asarray(0.5), mk(k, c, c), mk(k, c),
           mk(k, c, r), mk(k, r), mk(k, c, r), mk(k, r), mk(k, r, t, t),
           mk(k, t)]
    x = mk(n, t, v, c)
    ref = np.asarray(jax.jit(lambda xx: ops.dstd_spatial(xx, *a_s))(x))
    res = {}

    def run(name, fn, check=False):
        try:
            out = jax.block_until_ready(jax.jit(fn)(x))
            res[name] = "OK"
            if check:
                err = float(np.abs(np.asarray(out) - ref).max())
                res[name] = f"OK maxerr={err:.2e}"
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:150]}"
        print(json.dumps({name: res[name]}), flush=True)

    run("bd_nb4", lambda xx: spatial_bd_pallas(xx, *a_s, nb=4), check=True)
    run("noagg_nb4",
        lambda xx: spatial_bd_pallas(xx, *a_s, nb=4, mode="noagg"))
    run("nodyn_nb4",
        lambda xx: spatial_bd_pallas(xx, *a_s, nb=4, mode="nodyn"))
    run("bd_nb8", lambda xx: spatial_bd_pallas(xx, *a_s, nb=8), check=True)
    run("bd_nb8_bf16",
        lambda xx: spatial_bd_pallas(xx, *a_s, nb=8,
                                     dot_dtype=jnp.bfloat16), check=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
