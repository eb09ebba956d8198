#!/usr/bin/env python
"""Temporal fused-kernel stage ablation + bf16 dots + hybrid chains.

probe_mosaic12 (slope-corrected): fused spatial 0.375 ms beats XLA 0.608,
but fused temporal 0.505 ms loses to XLA 0.287.  The temporal kernel pays
two sublane relayouts the spatial one doesn't (joint-major xf re-batch and
the joint-major -> frame-major output transpose).  This probe:

  * ablates the temporal kernel stage by stage (slope timing);
  * tries bf16 matmul inputs (f32 accumulation) in both kernels;
  * times hybrid chains: fused spatial + XLA temporal (grid / bd+bf16).

Prints JSON.
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

from dstdgcn_tpu.kernels import fused  # noqa: E402
from dstdgcn_tpu.kernels.fused import (_pad_to, _row_mask,  # noqa: E402
                                       _stack_qk)
from dstdgcn_tpu.ops import dstd as ops  # noqa: E402

INTERPRET = jax.default_backend() != "tpu"


def _loop(op, x0, iters):
    def f(x):
        return jax.lax.fori_loop(0, iters, lambda i, acc: op(acc), x)

    jf = jax.jit(f)
    jax.block_until_ready(jf(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def time_slope(op, x0, i1=10, i2=60):
    t1 = _loop(op, x0, i1)
    t2 = _loop(op, x0, i2)
    return (t2 - t1) / (i2 - i1)


def _t_kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wqk_ref, bqk_ref,
              wrm_ref, brm_ref, out_ref, *, num_kernels, red, v_real,
              t_real, mode, dot_dtype=jnp.float32):
    nb, tp, vp, cin = x_ref.shape
    co = out_ref.shape[-1]
    if mode == "copy":
        out_ref[:] = x_ref[:]
        return
    dt = dot_dtype
    x2 = x_ref[:].reshape(nb * tp * vp, cin)
    x2d = x2.astype(dt) if dt != jnp.float32 else x2
    alpha = alpha_ref[0, 0]
    mask = _row_mask(nb * tp * vp, tp, vp, t_real, v_real)

    qk = jnp.dot(x2d, wqk_ref[:].astype(dt),
                 preferred_element_type=jnp.float32) + bqk_ref[0]
    qk3 = qk.reshape(nb * tp, vp, num_kernels * 2 * red)
    qk_t = jnp.swapaxes(qk3, 1, 2)

    xfs, adjs = [], []
    for k in range(num_kernels):
        xf = jnp.dot(x2d, wf_ref[k].astype(dt),
                     preferred_element_type=jnp.float32) + bf_ref[k]
        xf = xf * mask
        if mode == "noxfT":
            xf_v = xf.reshape(nb * vp, tp, co)   # WRONG layout, cost probe
        else:
            xf_v = jnp.swapaxes(xf.reshape(nb, tp, vp, co), 1, 2) \
                .reshape(nb * vp, tp, co)
        xfs.append(xf_v)
        if mode == "projonly":
            continue
        dyn = None
        for ri in range(red):
            qs = qk_t[:, k * 2 * red + ri, :].reshape(nb, tp, vp)
            ks = qk_t[:, k * 2 * red + red + ri, :].reshape(nb, tp, vp)
            s = jnp.tanh(qs[:, :, None, :] - ks[:, None, :, :])
            if mode == "nomix":
                d = s.reshape(nb * tp * tp, vp)[:, :vp]
                dyn = d if dyn is None else dyn + d
                continue
            d = jnp.dot(s.reshape(nb * tp * tp, vp).astype(dt),
                        wrm_ref[k, ri].astype(dt),
                        preferred_element_type=jnp.float32)
            dyn = d if dyn is None else dyn + d
        adj = dyn.reshape(nb, tp, tp, vp)
        adj = (adj + brm_ref[k]) * alpha + base_ref[k][None]
        if mode == "noadjT":
            adj_v = adj.reshape(nb * vp, tp, tp)  # WRONG layout, cost probe
        else:
            adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)
            adj_v = adj.reshape(nb * vp, tp, tp)
            adj_v = jnp.swapaxes(adj_v, 1, 2)
        adjs.append(adj_v.astype(dt) if dt != jnp.float32 else adj_v)
    if mode == "projonly":
        out = functools.reduce(jnp.add, [a.reshape(nb * tp * vp, co)
                                         for a in xfs])
        out_ref[:] = (out * mask).reshape(nb, tp, vp, co)
        return
    adj_cat = adjs[0] if num_kernels == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if num_kernels == 1 else jnp.concatenate(xfs, axis=1)
    if dt != jnp.float32:
        xf_cat = xf_cat.astype(dt)
    if mode == "noagg":
        out = xf_cat.reshape(nb * tp * vp, co).astype(jnp.float32) \
            + adj_cat[0, 0, 0]
        out_ref[:] = (out * mask).reshape(nb, tp, vp, co)
        return
    out_v = jax.lax.dot_general(
        adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if mode == "nooutT":
        out = out_v.reshape(nb * tp * vp, co)
    else:
        out = jnp.swapaxes(out_v.reshape(nb, vp, tp, co), 1, 2) \
            .reshape(nb * tp * vp, co)
    out_ref[:] = (out * mask).reshape(nb, tp, vp, co)


def temporal(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
             *, nb=4, mode="full", dot_dtype=jnp.float32):
    n, t, v, cin = x.shape
    k, co = wf.shape[0], wf.shape[-1]
    red = wm1.shape[-1]
    vp, tp = -(-v // 8) * 8, -(-t // 8) * 8
    x_p = _pad_to(_pad_to(x.astype(jnp.float32), 2, vp), 1, tp)
    wrm_p = _pad_to(_pad_to(wrm, 2, vp), 3, vp)
    base_p = _pad_to(_pad_to(base, 1, tp), 2, tp)[..., None]
    brm_p = _pad_to(brm, 1, vp)[:, None, None, :]
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    bf2 = bf[:, None, :]
    wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)

    def vmem_full(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_t_kernel, num_kernels=k, red=red, v_real=v,
                          t_real=t, mode=mode, dot_dtype=dot_dtype),
        out_shape=jax.ShapeDtypeStruct((n, tp, vp, co), jnp.float32),
        grid=(n // nb,),
        in_specs=[pl.BlockSpec((nb, tp, vp, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  vmem_full(base_p), vmem_full(alpha_arr), vmem_full(wf),
                  vmem_full(bf2), vmem_full(wqk), vmem_full(bqk),
                  vmem_full(wrm_p), vmem_full(brm_p)],
        out_specs=pl.BlockSpec((nb, tp, vp, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x_p, base_p, alpha_arr, wf, bf2, wqk, bqk, wrm_p, brm_p)
    return out[:, :t, :v, :]


def main():
    k, t, v, c, r, n = 2, 35, 22, 64, 2, 128
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)

    a_s = [mk(k, v, v), jnp.asarray(0.5), mk(k, c, c), mk(k, c),
           mk(k, c, r), mk(k, r), mk(k, c, r), mk(k, r), mk(k, r, t, t),
           mk(k, t)]
    a_t = [mk(1, t, t), jnp.asarray(0.5), mk(1, c, c), mk(1, c),
           mk(1, c, r), mk(1, r), mk(1, c, r), mk(1, r), mk(1, r, v, v),
           mk(1, v)]
    x = mk(n, t, v, c)
    res = {"device": str(jax.devices()[0])}
    ref_t = np.asarray(jax.jit(lambda xx: ops.dstd_temporal(xx, *a_t))(x))

    def run(name, fn, check_against=None, atol=None):
        try:
            if check_against is not None:
                got = np.asarray(jax.jit(fn)(x))
                err = float(np.abs(got - check_against).max())
                res[name + "_maxerr"] = round(err, 6)
                if atol is not None and err > atol:
                    res[name] = f"WRONG (err {err})"
                    print(json.dumps({name: res[name]}), flush=True)
                    return
            res[name] = round(time_slope(fn, x) * 1e3, 4)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:140]}"
        print(json.dumps({name: res[name]}), flush=True)

    for mode in ("copy", "projonly", "nomix", "noagg", "noxfT", "noadjT",
                 "nooutT", "full"):
        run(f"t_{mode}", lambda xx, m=mode: temporal(xx, *a_t, mode=m))
    run("t_full_check", lambda xx: temporal(xx, *a_t), ref_t, 1e-3)
    run("t_bf16", lambda xx: temporal(xx, *a_t, dot_dtype=jnp.bfloat16),
        ref_t, 0.05)

    # hybrid chains
    bf16 = jnp.bfloat16

    def chain(sfn, tfn):
        def f(xx):
            for _ in range(7):
                xx = sfn(xx)
                xx = tfn(xx)
            return xx.astype(jnp.float32)
        return f

    run("chain14_hybrid_grid",
        chain(lambda xx: fused.dstd_spatial(xx, *a_s),
              lambda xx: ops.dstd_temporal(xx, *a_t)))
    run("chain14_hybrid_bd_bf16",
        chain(lambda xx: fused.dstd_spatial(xx, *a_s),
              lambda xx: ops.dstd_temporal(xx, *a_t, dtype=bf16,
                                           agg_group=3)))
    run("chain14_sfused_tbf16pal",
        chain(lambda xx: fused.dstd_spatial(xx, *a_s),
              lambda xx: temporal(xx, *a_t, dot_dtype=bf16)))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
