#!/usr/bin/env python
"""Probe: MXU-efficient aggregation formulations for the DSTD-GC ops.

Round-1 finding (BENCH_r01.json / VERDICT.md): the per-(sample,frame)
V x V aggregation is the measured floor — a batched tiny matmul that
reloads the MXU weight plane at ~15% density per batch item.  This probe
measures, on the attached chip:

  * XLA grid (status quo) vs XLA block-diagonal grouped aggregation
    (ops.dstd agg_group) — f32 and bf16, single op and 7-block chain;
  * the current fused Pallas kernel vs ablations (no-aggregation /
    no-dynamic-adjacency) to locate its internal floor;
  * a new fused Pallas variant whose aggregation packs g frames (joints)
    into one block-diagonal (g*Vp) x (g*Vp) matmul assembled in VMEM
    scratch — the block-diagonal zeros never exist in HBM.

Each variant is wrapped in try/except: a Mosaic rejection reports the
error string instead of killing the probe.  Prints one JSON dict.
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


# ---------------------------------------------------------------- pallas --

def _row_mask(nrows, tp, vp, t_real, v_real):
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
    ok = rows % vp < v_real
    if t_real < tp:
        ok = jnp.logical_and(ok, (rows // vp) % tp < t_real)
    return jnp.where(ok, 1.0, 0.0).astype(jnp.float32)


def _proj(x2, w_ref, b_ref, k):
    y = jnp.dot(x2, w_ref[k], preferred_element_type=jnp.float32)
    return y + b_ref[k]


def _spatial_bd_kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wm1_ref,
                       bm1_ref, wm2_ref, bm2_ref, wrm_ref, brm_ref, out_ref,
                       bd_ref, *, num_kernels, v_real, g, mode):
    """Spatial DSTD-GC with block-diagonal VMEM aggregation.

    mode: "bd" full op; "noagg" skips the final aggregation matmul;
    "nodyn" skips scores/mixing (adjacency = base only, keeps the batched
    aggregation of the CURRENT kernel for ablation).
    """
    nb, t, vp, cin = x_ref.shape
    co = out_ref.shape[-1]
    r = wm1_ref.shape[-1]
    ng = (nb * t) // g
    dot_dt = bd_ref.dtype
    x2 = x_ref[:].reshape(nb * t * vp, cin)
    if x_ref.dtype != jnp.float32:
        x2d = x2  # already compute dtype
    else:
        x2d = x2.astype(dot_dt) if dot_dt != jnp.float32 else x2
    alpha = alpha_ref[0, 0]
    jmask = _row_mask(nb * t * vp, t, vp, t, v_real)

    if mode == "bd":
        bd_ref[:] = jnp.zeros_like(bd_ref)

    acc = None
    for k in range(num_kernels):
        xf = _proj(x2d, wf_ref, bf_ref, k) * jmask       # (rows, co) f32
        if mode == "noagg":
            o = xf.reshape(ng, g * vp, co)
            acc = o if acc is None else acc + o
            continue
        if mode == "nodyn":
            adj = jnp.broadcast_to(base_ref[k][:, :, 0][None],
                                   (nb * t, vp, vp))
            o = jax.lax.dot_general(
                adj.astype(dot_dt), xf.reshape(nb * t, vp, co).astype(dot_dt),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o = o.reshape(ng, g * vp, co)
            acc = o if acc is None else acc + o
            continue
        q = _proj(x2d, wm1_ref, bm1_ref, k)
        kk = _proj(x2d, wm2_ref, bm2_ref, k)
        svs = []
        for ri in range(r):
            q4 = q[:, ri:ri + 1].reshape(nb, t, vp, 1)
            k4 = kk[:, ri:ri + 1].reshape(nb, t, vp, 1)
            qv = jnp.swapaxes(jnp.swapaxes(q4, 1, 2), 2, 3)  # (nb, v, 1, t)
            kv = jnp.swapaxes(jnp.swapaxes(k4, 1, 2), 2, 3)
            # agg "right": a = w (k-side is output), b = v contracted
            svs.append(jnp.tanh(jnp.swapaxes(qv, 1, 2) - kv))
        s_cat = svs[0] if r == 1 else jnp.concatenate(svs, axis=3)
        dyn = jnp.dot(s_cat.reshape(nb * vp * vp, r * t).astype(dot_dt),
                      wrm_ref[k].astype(dot_dt),
                      preferred_element_type=jnp.float32)
        adj = dyn.reshape(nb, vp, vp, t)
        adj = (adj + brm_ref[k]) * alpha + base_ref[k][None]
        adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)  # (nb, t, a, b)
        adj4 = adj.reshape(ng, g, vp, vp).astype(dot_dt)
        for gi in range(g):
            bd_ref[:, gi * vp:(gi + 1) * vp, gi * vp:(gi + 1) * vp] = \
                adj4[:, gi]
        xfg = xf.reshape(ng, g * vp, co).astype(dot_dt)
        o = jax.lax.dot_general(bd_ref[:], xfg,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        acc = o if acc is None else acc + o
    out = acc.reshape(nb * t * vp, co) * jmask
    out_ref[:] = out.reshape(nb, t, vp, co).astype(out_ref.dtype)


def _pad_to(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    w = [(0, 0)] * x.ndim
    w[axis] = (0, pad)
    return jnp.pad(x, w)


def spatial_bd_pallas(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
                      *, nb=4, vp=32, g=4, dot_dtype=jnp.float32,
                      mode="bd"):
    n, t, v, cin = x.shape
    k, co = wf.shape[0], wf.shape[-1]
    assert (nb * t) % g == 0
    x_p = _pad_to(x, 2, vp)
    if dot_dtype != jnp.float32:
        x_p = x_p.astype(dot_dtype)
    base_p = jnp.swapaxes(_pad_to(_pad_to(base, 1, vp), 2, vp), 1, 2)
    base_p = base_p[..., None]                        # (K, a, b, 1)
    wrm2 = wrm.reshape(k, wrm.shape[1] * wrm.shape[2], wrm.shape[3])
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    bf2, bm12, bm22 = bf[:, None, :], bm1[:, None, :], bm2[:, None, :]
    brm_p = brm[:, None, None, :]

    def vmem_full(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_spatial_bd_kernel, num_kernels=k, v_real=v, g=g,
                          mode=mode),
        out_shape=jax.ShapeDtypeStruct((n, t, vp, co), jnp.float32),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, t, vp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem_full(base_p), vmem_full(alpha_arr), vmem_full(wf),
            vmem_full(bf2), vmem_full(wm1), vmem_full(bm12), vmem_full(wm2),
            vmem_full(bm22), vmem_full(wrm2), vmem_full(brm_p),
        ],
        out_specs=pl.BlockSpec((nb, t, vp, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nb * t // g, g * vp, g * vp), dot_dtype),
        ],
        interpret=INTERPRET,
    )(x_p, base_p, alpha_arr, wf, bf2, wm1, bm12, wm2, bm22, wrm2, brm_p)
    return out[:, :, :v, :]


# --------------------------------------------------------------- harness --

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

    def run(name, fn, check_against=None, atol=None):
        try:
            if check_against is not None:
                got = np.asarray(jax.jit(fn)(x))
                err = float(np.abs(got - check_against).max())
                res[name + "_maxerr"] = round(err, 6)
                if atol is not None and err > atol:
                    res[name] = f"WRONG (err {err})"
                    return
            res[name] = round(_time_looped(fn, x) * 1e3, 3)
        except Exception as e:
            res[name] = f"{type(e).__name__}: {str(e)[:180]}"
        print(json.dumps({name: res[name]}), flush=True)

    ref_s = np.asarray(jax.jit(
        lambda xx: ops.dstd_spatial(xx, *a_s))(x))

    # --- single spatial op ---
    run("s_xla_grid", lambda xx: ops.dstd_spatial(xx, *a_s))
    run("s_xla_bd5", lambda xx: ops.dstd_spatial(xx, *a_s, agg_group=5),
        ref_s, 1e-3)
    run("s_xla_bd5_bf16",
        lambda xx: ops.dstd_spatial(xx, *a_s, dtype=jnp.bfloat16,
                                    agg_group=5).astype(jnp.float32))
    run("s_pallas_cur", lambda xx: fused.dstd_spatial(xx, *a_s))
    run("s_pallas_bd_nb4",
        lambda xx: spatial_bd_pallas(xx, *a_s), ref_s, 1e-3)
    run("s_pallas_bd_nb8",
        lambda xx: spatial_bd_pallas(xx, *a_s, nb=8), ref_s, 1e-3)
    run("s_pallas_bd_nb8_bf16",
        lambda xx: spatial_bd_pallas(xx, *a_s, nb=8,
                                     dot_dtype=jnp.bfloat16))
    run("s_pallas_noagg_nb8",
        lambda xx: spatial_bd_pallas(xx, *a_s, nb=8, mode="noagg"))
    run("s_pallas_nodyn_nb8",
        lambda xx: spatial_bd_pallas(xx, *a_s, nb=8, mode="nodyn"))

    # --- single temporal op ---
    run("t_xla_grid", lambda xx: ops.dstd_temporal(xx, *a_t))
    run("t_xla_bd3", lambda xx: ops.dstd_temporal(xx, *a_t, agg_group=3))
    run("t_pallas_cur", lambda xx: fused.dstd_temporal(xx, *a_t))

    # --- 7-block chains (the bench shape) ---
    def chain(dtype=None, agg_group_s=None, agg_group_t=None):
        def f(xx):
            for _ in range(7):
                xx = ops.dstd_spatial(xx, *a_s, dtype=dtype,
                                      agg_group=agg_group_s)
                xx = ops.dstd_temporal(xx, *a_t, dtype=dtype,
                                       agg_group=agg_group_t)
            return xx.astype(jnp.float32)
        return f

    run("chain14_xla_grid_f32", chain())
    run("chain14_xla_bd_f32", chain(agg_group_s=5, agg_group_t=3))
    run("chain14_xla_bd_bf16",
        chain(dtype=jnp.bfloat16, agg_group_s=5, agg_group_t=3))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
