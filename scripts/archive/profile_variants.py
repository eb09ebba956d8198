#!/usr/bin/env python
"""Compare einsum spellings of the spatial DSTD layer by compiled bytes
accessed + measured time.  The score tensor S and adjacency dominate HBM
traffic; their padded size depends on which dims land minor-most.

Variants:
  A  current ops.dstd (S (K,N,RT,V,W), adj (K,N,T,V,W))
  B  S (K,N,V,W,RT) rt-minor, adj (K,N,V,W,T) t-minor
  C  like B but adj (K,N,T,V,W) (aggregation-friendly layout)
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

from dstdgcn_tpu.ops import dstd as ops  # noqa: E402

K, N, T, V, C, R = 2, 128, 35, 22, 64, 2


def _time_looped(op, x0, iters=50):
    def f(x):
        def body(i, acc):
            return op(acc)
        return jax.lax.fori_loop(0, iters, body, x)

    jf = jax.jit(f)
    jax.block_until_ready(jf(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


rng = np.random.RandomState(0)


def mk(*shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)


P = dict(base=mk(K, V, V), alpha=jnp.asarray(0.5), wf=mk(K, C, C),
         bf=mk(K, C), wm1=mk(K, C, R), bm1=mk(K, R), wm2=mk(K, C, R),
         bm2=mk(K, R), wrm=mk(K, R, T, T), brm=mk(K, T))


def variant_a(x):
    return ops.dstd_spatial(x, *P.values())


def _qk_rt_minor(x):
    q = jnp.einsum("ntvc,kcr->knvrt", x, P["wm1"],
                   preferred_element_type=jnp.float32) \
        + P["bm1"][:, None, None, :, None]
    k = jnp.einsum("ntvc,kcr->knvrt", x, P["wm2"],
                   preferred_element_type=jnp.float32) \
        + P["bm2"][:, None, None, :, None]
    q = q.reshape(K, N, V, R * T)
    k = k.reshape(K, N, V, R * T)
    return jnp.tanh(q[:, :, :, None, :] - k[:, :, None, :, :])


def variant_b(x):
    xf = jnp.einsum("ntvc,kcd->kntvd", x, P["wf"],
                    preferred_element_type=jnp.float32) \
        + P["bf"][:, None, None, None, :]
    s = _qk_rt_minor(x)                                   # (K,N,V,W,RT)
    dyn = jnp.einsum("knvws,kst->knvwt", s,
                     P["wrm"].reshape(K, R * T, T),
                     preferred_element_type=jnp.float32)
    adj = dyn * P["alpha"] + P["base"][:, None, :, :, None] \
        + P["brm"][:, None, None, None, :]
    return jnp.einsum("kntvc,knvwt->ntwc", xf, adj,
                      preferred_element_type=jnp.float32)


def variant_c(x):
    xf = jnp.einsum("ntvc,kcd->kntvd", x, P["wf"],
                    preferred_element_type=jnp.float32) \
        + P["bf"][:, None, None, None, :]
    s = _qk_rt_minor(x)                                   # (K,N,V,W,RT)
    dyn = jnp.einsum("knvws,kst->kntvw", s,
                     P["wrm"].reshape(K, R * T, T),
                     preferred_element_type=jnp.float32)
    adj = dyn * P["alpha"] + P["base"][:, None, None, :, :] \
        + P["brm"][:, None, :, None, None]
    return jnp.einsum("kntvc,kntvw->ntwc", xf, adj,
                      preferred_element_type=jnp.float32)


def main():
    x = mk(N, T, V, C)
    want = np.asarray(variant_a(x))
    res = {}
    for name, fn in (("A_current", variant_a), ("B_rt_minor", variant_b),
                     ("C_rt_minor_aggA", variant_c)):
        got = np.asarray(jax.jit(fn)(x))
        err = float(np.abs(got - want).max())
        compiled = jax.jit(fn).lower(x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        ms = _time_looped(fn, x) * 1e3
        res[name] = {"ms": round(ms, 4),
                     "bytes_MB": round(float(ca.get("bytes accessed", 0))
                                       / 1e6, 1),
                     "max_abs_err_vs_A": round(err, 6)}
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
