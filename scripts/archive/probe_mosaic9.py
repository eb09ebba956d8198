#!/usr/bin/env python
"""Stage ablation INSIDE the fused spatial DSTD kernel.

probe_mosaic8: the BD-aggregation rewrite compiles + is exact but does NOT
beat the shipping fused kernel, and the whole-chain fused path is ~2x slower
than plain XLA — so the per-program cost is NOT dominated by the batched
tiny aggregation matmuls.  This probe rebuilds the shipping kernel body with
stages knocked out one at a time to locate the real hog:

  full      everything (baseline, = fused.dstd_spatial)
  copy      out = x (grid/DMA pipeline floor)
  projonly  feature projection only (out = xf)
  noscore   + fake scores (skip q/k transposes + tanh; s_cat = const)
  notanh    real score layout work, tanh replaced by identity (sub only)
  nomix     scores built, mixing matmul skipped (dyn = slice of s_cat)
  noagg     everything except the final aggregation dot
  nodyn     adjacency = base only (skip scores+mix), keep aggregation

Also sweeps nb (samples per program) on the full kernel.  Prints JSON.
"""

import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

INTERPRET = jax.default_backend() != "tpu"


def _time_looped(op, x0, iters=30):
    def f(x):
        return jax.lax.fori_loop(0, iters, lambda i, acc: op(acc), x)

    jf = jax.jit(f)
    jax.block_until_ready(jf(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _row_mask(nrows, tp, vp, t_real, v_real):
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
    ok = rows % vp < v_real
    if t_real < tp:
        ok = jnp.logical_and(ok, (rows // vp) % tp < t_real)
    return jnp.where(ok, 1.0, 0.0).astype(jnp.float32)


def _proj(x2, w_ref, b_ref, k):
    y = jnp.dot(x2, w_ref[k], preferred_element_type=jnp.float32)
    return y + b_ref[k]


def _kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wm1_ref, bm1_ref,
            wm2_ref, bm2_ref, wrm_ref, brm_ref, out_ref,
            *, num_kernels, v_real, mode):
    nb, t, vp, cin = x_ref.shape
    co = out_ref.shape[-1]
    r = wm1_ref.shape[-1]
    if mode == "copy":
        out_ref[:] = x_ref[:]
        return
    x2 = x_ref[:].reshape(nb * t * vp, cin)
    alpha = alpha_ref[0, 0]
    jmask = _row_mask(nb * t * vp, t, vp, t, v_real)

    xfs, adjs = [], []
    for k in range(num_kernels):
        xf = _proj(x2, wf_ref, bf_ref, k) * jmask
        if mode == "projonly":
            xfs.append(xf.reshape(nb * t, vp, co))
            continue
        xfs.append(xf.reshape(nb * t, vp, co))
        if mode == "nodyn":
            adj = jnp.broadcast_to(base_ref[k][:, :, 0][None],
                                   (nb * t, vp, vp))
            adjs.append(adj)
            continue
        q = _proj(x2, wm1_ref, bm1_ref, k)
        kk = _proj(x2, wm2_ref, bm2_ref, k)
        if mode == "noscore":
            s_cat = jnp.broadcast_to(q[0, 0], (nb, vp, vp, r * t))
        else:
            svs = []
            for ri in range(r):
                q4 = q[:, ri:ri + 1].reshape(nb, t, vp, 1)
                k4 = kk[:, ri:ri + 1].reshape(nb, t, vp, 1)
                qv = jnp.swapaxes(jnp.swapaxes(q4, 1, 2), 2, 3)
                kv = jnp.swapaxes(jnp.swapaxes(k4, 1, 2), 2, 3)
                d = jnp.swapaxes(qv, 1, 2) - kv
                svs.append(d if mode == "notanh" else jnp.tanh(d))
            s_cat = svs[0] if r == 1 else jnp.concatenate(svs, axis=3)
        if mode == "nomix":
            adj = s_cat[:, :, :, :t]                     # (nb, a, b, t)
        else:
            dyn = jnp.dot(s_cat.reshape(nb * vp * vp, r * t), wrm_ref[k],
                          preferred_element_type=jnp.float32)
            adj = dyn.reshape(nb, vp, vp, t)
        adj = (adj + brm_ref[k]) * alpha + base_ref[k][None]
        adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)
        adjs.append(adj.reshape(nb * t, vp, vp))
    if mode in ("projonly", "noagg"):
        out = functools.reduce(jnp.add, xfs).reshape(nb * t * vp, co)
        if mode == "noagg" and adjs:
            out = out + adjs[0][:, :, :1].reshape(nb * t * vp, 1)[:, :1]
        out_ref[:] = (out * jmask).reshape(nb, t, vp, co)
        return
    adj_cat = adjs[0] if num_kernels == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if num_kernels == 1 else jnp.concatenate(xfs, axis=1)
    out = jax.lax.dot_general(adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out = out.reshape(nb * t * vp, co) * jmask
    out_ref[:] = out.reshape(nb, t, vp, co)


def _pad_to(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    w = [(0, 0)] * x.ndim
    w[axis] = (0, pad)
    return jnp.pad(x, w)


def _vmem_full(a):
    nd = a.ndim
    return pl.BlockSpec(a.shape, lambda i, _n=nd: (0,) * _n,
                        memory_space=pltpu.VMEM)


def spatial(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
            *, nb=4, vp=24, mode="full"):
    n, t, v, cin = x.shape
    k, co = wf.shape[0], wf.shape[-1]
    x_p = _pad_to(x, 2, vp)
    base_p = jnp.swapaxes(_pad_to(_pad_to(base, 1, vp), 2, vp), 1, 2)
    base_p = base_p[..., None]
    wrm2 = wrm.reshape(k, wrm.shape[1] * wrm.shape[2], wrm.shape[3])
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    bf2, bm12, bm22 = bf[:, None, :], bm1[:, None, :], bm2[:, None, :]
    brm_p = brm[:, None, None, :]
    out = pl.pallas_call(
        functools.partial(_kernel, num_kernels=k, v_real=v, mode=mode),
        out_shape=jax.ShapeDtypeStruct((n, t, vp, co), jnp.float32),
        grid=(n // nb,),
        in_specs=[pl.BlockSpec((nb, t, vp, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  _vmem_full(base_p), _vmem_full(alpha_arr), _vmem_full(wf),
                  _vmem_full(bf2), _vmem_full(wm1), _vmem_full(bm12),
                  _vmem_full(wm2), _vmem_full(bm22), _vmem_full(wrm2),
                  _vmem_full(brm_p)],
        out_specs=pl.BlockSpec((nb, t, vp, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x_p, base_p, alpha_arr, wf, bf2, wm1, bm12, wm2, bm22, wrm2, brm_p)
    return out[:, :, :v, :]


def main():
    k, t, v, c, r, n = 2, 35, 22, 64, 2, 128
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    a_s = [mk(k, v, v), jnp.asarray(0.5), mk(k, c, c), mk(k, c),
           mk(k, c, r), mk(k, r), mk(k, c, r), mk(k, r), mk(k, r, t, t),
           mk(k, t)]
    x = mk(n, t, v, c)
    res = {"device": str(jax.devices()[0])}

    def run(name, fn):
        try:
            res[name] = round(_time_looped(fn, x) * 1e3, 3)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({name: res[name]}), flush=True)

    for mode in ("copy", "projonly", "noscore", "notanh", "nomix",
                 "noagg", "nodyn", "full"):
        run(f"s_{mode}", lambda xx, m=mode: spatial(xx, *a_s, mode=m))
    for nb in (8, 16, 32):
        run(f"s_full_nb{nb}",
            lambda xx, b=nb: spatial(xx, *a_s, nb=b))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
