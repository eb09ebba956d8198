#!/usr/bin/env python
"""Probe: fused DSTD kernels with CONCAT-assembled block-diagonal aggregation.

probe_agg's BD kernel (VMEM scratch + strided slice writes) crashes the
Mosaic compile helper; probe_mosaic6 showed each construct compiles alone.
This probe sidesteps the scratch entirely: the block-diagonal aggregation
matrix is assembled with lane-pads + concats (constructs the shipping
fused kernel already uses), so g frame/joint adjacencies fuse into one
(g*P) x (g*P) matmul that fills the MXU instead of g tiny P x P matmuls.

Variants: spatial vp=24/32, g=4, f32/bf16 dots; temporal g=3; plus the
7-block chain (the bench shape) for the winning configs.  Prints JSON.
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
from dstdgcn_tpu.ops import dstd as ops  # noqa: E402

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


def _block_diag_concat(adj, ng, g, p, dt):
    """(ng*g, p, p) per-item adjacencies -> (ng, g*p, g*p) block-diagonal,
    assembled with zero-pads + concats (no scratch, no strided writes)."""
    a4 = adj.reshape(ng, g, p, p).astype(dt)
    z = jnp.zeros((ng, p, p), dt)
    rows = []
    for gi in range(g):
        pieces = [z] * gi + [a4[:, gi]] + [z] * (g - 1 - gi)
        rows.append(pieces[0] if g == 1 else jnp.concatenate(pieces, axis=2))
    return rows[0] if g == 1 else jnp.concatenate(rows, axis=1)


def _spatial_bd_kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wm1_ref,
                       bm1_ref, wm2_ref, bm2_ref, wrm_ref, brm_ref, out_ref,
                       *, num_kernels, v_real, g, dot_dtype):
    nb, t, vp, cin = x_ref.shape
    co = out_ref.shape[-1]
    r = wm1_ref.shape[-1]
    ng = (nb * t) // g
    dt = dot_dtype
    x2 = x_ref[:].reshape(nb * t * vp, cin)
    x2d = x2.astype(dt) if x2.dtype != dt else x2
    alpha = alpha_ref[0, 0]
    jmask = _row_mask(nb * t * vp, t, vp, t, v_real)

    acc = None
    for k in range(num_kernels):
        xf = _proj(x2d, wf_ref, bf_ref, k) * jmask        # (rows, co) f32
        q = _proj(x2d, wm1_ref, bm1_ref, k)
        kk = _proj(x2d, wm2_ref, bm2_ref, k)
        svs = []
        for ri in range(r):
            q4 = q[:, ri:ri + 1].reshape(nb, t, vp, 1)
            k4 = kk[:, ri:ri + 1].reshape(nb, t, vp, 1)
            qv = jnp.swapaxes(jnp.swapaxes(q4, 1, 2), 2, 3)  # (nb, v, 1, t)
            kv = jnp.swapaxes(jnp.swapaxes(k4, 1, 2), 2, 3)
            # agg "right": rows of the BD matrix are the OUTPUT joints (w =
            # k-side), columns the contracted ones (v = q-side)
            svs.append(jnp.tanh(jnp.swapaxes(qv, 1, 2) - kv))
        s_cat = svs[0] if r == 1 else jnp.concatenate(svs, axis=3)
        dyn = jnp.dot(s_cat.reshape(nb * vp * vp, r * t).astype(dt),
                      wrm_ref[k].astype(dt),
                      preferred_element_type=jnp.float32)
        adj = dyn.reshape(nb, vp, vp, t)
        adj = (adj + brm_ref[k]) * alpha + base_ref[k][None]
        adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)  # (nb, t, a, b)
        bd = _block_diag_concat(adj.reshape(nb * t, vp, vp), ng, g, vp, dt)
        xfg = xf.reshape(ng, g * vp, co).astype(dt)
        o = jax.lax.dot_general(bd, xfg, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        acc = o if acc is None else acc + o
    out = acc.reshape(nb * t * vp, co) * jmask
    out_ref[:] = out.reshape(nb, t, vp, co).astype(out_ref.dtype)


def _temporal_bd_kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wm1_ref,
                        bm1_ref, wm2_ref, bm2_ref, wrm_ref, brm_ref, out_ref,
                        *, num_kernels, v_real, t_real, g, dot_dtype):
    nb, tp, vp, cin = x_ref.shape
    co = out_ref.shape[-1]
    r = wm1_ref.shape[-1]
    ng = (nb * vp) // g
    dt = dot_dtype
    x2 = x_ref[:].reshape(nb * tp * vp, cin)
    x2d = x2.astype(dt) if x2.dtype != dt else x2
    alpha = alpha_ref[0, 0]
    mask = _row_mask(nb * tp * vp, tp, vp, t_real, v_real)

    acc = None
    for k in range(num_kernels):
        xf = _proj(x2d, wf_ref, bf_ref, k) * mask
        xf_v = jnp.swapaxes(xf.reshape(nb, tp, vp, co), 1, 2) \
            .reshape(nb * vp, tp, co)
        q = _proj(x2d, wm1_ref, bm1_ref, k)
        kk = _proj(x2d, wm2_ref, bm2_ref, k)
        svs = []
        for ri in range(r):
            q4 = q[:, ri:ri + 1].reshape(nb, tp, vp, 1)
            k4 = kk[:, ri:ri + 1].reshape(nb, tp, vp, 1)
            qt = jnp.swapaxes(q4, 2, 3)                  # (nb, Tq, 1, vp)
            kt = jnp.swapaxes(jnp.swapaxes(k4, 2, 3), 1, 2)  # (nb,1,Tu,vp)
            svs.append(jnp.tanh(qt - kt))                # (nb, Tq, Tu, vp)
        s_cat = svs[0] if r == 1 else jnp.concatenate(svs, axis=3)
        dyn = jnp.dot(s_cat.reshape(nb * tp * tp, r * vp).astype(dt),
                      wrm_ref[k].astype(dt),
                      preferred_element_type=jnp.float32)
        adj = dyn.reshape(nb, tp, tp, vp)
        adj = (adj + brm_ref[k]) * alpha + base_ref[k][None]
        adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)  # (nb, w, t, u)
        adj_v = adj.reshape(nb * vp, tp, tp)
        # agg "right": out[u] = sum_t adj[t, u] xf[t] -> transpose
        adj_v = jnp.swapaxes(adj_v, 1, 2)
        bd = _block_diag_concat(adj_v, ng, g, tp, dt)
        xfg = xf_v.reshape(ng, g * tp, co).astype(dt)
        o = jax.lax.dot_general(bd, xfg, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        acc = o if acc is None else acc + o
    out_v = acc.reshape(nb, vp, tp, co)
    out = jnp.swapaxes(out_v, 1, 2).reshape(nb * tp * vp, co) * mask
    out_ref[:] = out.reshape(nb, tp, vp, co).astype(out_ref.dtype)


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


def spatial_bd(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
               *, nb=4, vp=24, g=4, dot_dtype=jnp.float32):
    n, t, v, cin = x.shape
    k, co = wf.shape[0], wf.shape[-1]
    assert (nb * t) % g == 0
    x_p = _pad_to(x, 2, vp)
    base_p = jnp.swapaxes(_pad_to(_pad_to(base, 1, vp), 2, vp), 1, 2)
    base_p = base_p[..., None]
    wrm2 = wrm.reshape(k, wrm.shape[1] * wrm.shape[2], wrm.shape[3])
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    bf2, bm12, bm22 = bf[:, None, :], bm1[:, None, :], bm2[:, None, :]
    brm_p = brm[:, None, None, :]
    out = pl.pallas_call(
        functools.partial(_spatial_bd_kernel, num_kernels=k, v_real=v, g=g,
                          dot_dtype=dot_dtype),
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


def temporal_bd(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
                *, nb=4, vp=24, g=3, dot_dtype=jnp.float32):
    n, t, v, cin = x.shape
    k, co = wf.shape[0], wf.shape[-1]
    tp = -(-t // 8) * 8
    assert (nb * vp) % g == 0
    x_p = _pad_to(_pad_to(x, 2, vp), 1, tp)
    wrm_p = _pad_to(_pad_to(wrm, 2, vp), 3, vp)
    wrm2 = wrm_p.reshape(k, wrm.shape[1] * vp, vp)
    base_p = _pad_to(_pad_to(base, 1, tp), 2, tp)[..., None]
    brm_p = _pad_to(brm, 1, vp)[:, None, None, :]
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    bf2, bm12, bm22 = bf[:, None, :], bm1[:, None, :], bm2[:, None, :]
    out = pl.pallas_call(
        functools.partial(_temporal_bd_kernel, num_kernels=k, v_real=v,
                          t_real=t, g=g, dot_dtype=dot_dtype),
        out_shape=jax.ShapeDtypeStruct((n, tp, vp, co), jnp.float32),
        grid=(n // nb,),
        in_specs=[pl.BlockSpec((nb, tp, vp, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  _vmem_full(base_p), _vmem_full(alpha_arr), _vmem_full(wf),
                  _vmem_full(bf2), _vmem_full(wm1), _vmem_full(bm12),
                  _vmem_full(wm2), _vmem_full(bm22), _vmem_full(wrm2),
                  _vmem_full(brm_p)],
        out_specs=pl.BlockSpec((nb, tp, vp, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x_p, base_p, alpha_arr, wf, bf2, wm1, bm12, wm2, bm22, wrm2, brm_p)
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

    ref_s = np.asarray(jax.jit(lambda xx: ops.dstd_spatial(xx, *a_s))(x))
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
            res[name] = round(_time_looped(fn, x) * 1e3, 3)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({name: res[name]}), flush=True)

    bf16 = jnp.bfloat16
    run("s_cur", lambda xx: fused.dstd_spatial(xx, *a_s))
    run("s_bd_vp24_g4", lambda xx: spatial_bd(xx, *a_s), ref_s, 1e-3)
    run("s_bd_vp32_g4", lambda xx: spatial_bd(xx, *a_s, vp=32), ref_s, 1e-3)
    run("s_bd_vp24_g4_bf16",
        lambda xx: spatial_bd(xx, *a_s, dot_dtype=bf16), ref_s, 0.1)
    run("s_bd_vp32_g4_bf16",
        lambda xx: spatial_bd(xx, *a_s, vp=32, dot_dtype=bf16), ref_s, 0.1)
    run("s_bd_vp24_g8_nb8",
        lambda xx: spatial_bd(xx, *a_s, nb=8, g=8), ref_s, 1e-3)

    run("t_cur", lambda xx: fused.dstd_temporal(xx, *a_t))
    run("t_bd_vp24_g3", lambda xx: temporal_bd(xx, *a_t), ref_t, 1e-3)
    run("t_bd_vp24_g3_bf16",
        lambda xx: temporal_bd(xx, *a_t, dot_dtype=bf16), ref_t, 0.1)
    run("t_bd_vp32_g4",
        lambda xx: temporal_bd(xx, *a_t, vp=32, g=4), ref_t, 1e-3)

    # --- 7-block chains (the bench shape) ---
    def chain(sfn, tfn):
        def f(xx):
            for _ in range(7):
                xx = sfn(xx)
                xx = tfn(xx)
            return xx
        return f

    run("chain14_bd_f32",
        chain(lambda xx: spatial_bd(xx, *a_s),
              lambda xx: temporal_bd(xx, *a_t)))
    run("chain14_bd_bf16",
        chain(lambda xx: spatial_bd(xx, *a_s, dot_dtype=bf16),
              lambda xx: temporal_bd(xx, *a_t, dot_dtype=bf16)))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
