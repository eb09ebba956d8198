#!/usr/bin/env python
"""Round-3 probe 10: packed-score kernels via VMEM-scratch materialization.

probe_r9: Mosaic also crashes when the lane-concat consumes lazy
broadcast-diff expressions.  Here the per-ri diffs are STORED into a VMEM
scratch at static lane offsets (stores force materialization), then ONE
tanh + ONE mixing matmul run on the packed buffer.

probe_r6 isolated the Mosaic crash to in-kernel weight reshapes
(wrm[k].reshape(R*T, T) merges a major dim into sublanes); the score
lane-concat itself is the same op the working kernel uses for adj_cat.
Here the paired mixing weights are HOST-prepped as (K, R*Tp, Tp) /
(K, R*Vp, Vp) and the kernel never reshapes a ref.

Variants:
  pair2          : paired-lane scores (R channels lane-concatenated), one
                   mixing matmul per kernel (K doubled), single-permute
                   adjacency relayout
  pair2_projcat  : + both spatial feature projections merged into one
                   (rows, 64)@(64, 128) matmul, split by lane slices
  + nb sweep on the winner
"""

import functools
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from dstdgcn_tpu.kernels import fused as fk


def log(**kw):
    print(json.dumps(kw), flush=True)


def _spatial_v(x2, nb, tp, vp, cin, jmask, ks, red, agg, variant,
               base, alpha, wf, bf, wqk, bqk, wrm2, brm, dtype=None):
    """wf: (Ci, K*Co) merged panel; wrm2: (K, R*Tp, Tp) host-stacked."""
    co = wf.shape[-1] // ks
    qk = jnp.dot(x2, wqk, preferred_element_type=jnp.float32) + bqk
    qk4 = qk.reshape(nb, tp, vp, ks * 2 * red)
    qk_t = jnp.swapaxes(jnp.swapaxes(qk4, 1, 2), 2, 3)   # (nb, vp, K2R, tp)
    xfp = jnp.dot(x2, wf, preferred_element_type=jnp.float32) + bf
    xfs, adjs = [], []
    for k in range(ks):
        xf = xfp[:, k * co:(k + 1) * co]
        xfs.append((xf * jmask).reshape(nb * tp, vp, co))
        # fresh-tensor lane concat: diffs per ri (broadcast sub), then
        # ONE packed tanh + ONE mixing matmul (Mosaic crashes on concat of
        # slice-of-transpose and on minor reshape-merges; fresh concat ok)
        ddt = jnp.float32 if dtype is None else dtype
        def mix_sp(scr, k=k):
            for ri in range(red):
                qs = qk_t[:, :, k * 2 * red + ri, :]
                kk = qk_t[:, :, k * 2 * red + red + ri, :]
                if dtype is not None:
                    qs, kk = qs.astype(dtype), kk.astype(dtype)
                if agg == "right":
                    d = qs[:, None, :, :] - kk[:, :, None, :]
                else:
                    d = qs[:, :, None, :] - kk[:, None, :, :]
                scr[:, :, :, ri * tp:(ri + 1) * tp] = d
            s = jnp.tanh(scr[:])
            w2 = wrm2[k] if dtype is None else wrm2[k].astype(dtype)
            return jnp.dot(s.reshape(nb * vp * vp, red * tp), w2,
                           preferred_element_type=jnp.float32)
        dyn = pl.run_scoped(mix_sp,
                            pltpu.VMEM((nb, vp, vp, red * tp), ddt))
        adj = dyn.reshape(nb, vp, vp, tp)
        adj = (adj + brm[k]) * alpha + base[k][None]
        adj = jnp.transpose(adj, (0, 3, 1, 2))            # (nb, To, a, b)
        adjs.append(adj.reshape(nb * tp, vp, vp))
    adj_cat = adjs[0] if ks == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if ks == 1 else jnp.concatenate(xfs, axis=1)
    out = jax.lax.dot_general(adj_cat, xf_cat,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return out.reshape(nb * tp * vp, co) * jmask


def _temporal_v(x2, nb, tp, vp, cin, jmask, kt, red, agg, variant,
                base, alpha, wf, bf, wqk, bqk, wrm2, brm, dtype=None):
    co = wf.shape[-1] // kt
    qk = jnp.dot(x2, wqk, preferred_element_type=jnp.float32) + bqk
    qk3 = qk.reshape(nb * tp, vp, kt * 2 * red)
    qk_t = jnp.swapaxes(qk3, 1, 2)                       # (nb*Tp, K2R, vp)
    xfp = jnp.dot(x2, wf, preferred_element_type=jnp.float32) + bf
    xfs, adjs = [], []
    for k in range(kt):
        xf = xfp[:, k * co:(k + 1) * co] * jmask
        xf_v = jnp.swapaxes(xf.reshape(nb, tp, vp, co), 1, 2) \
            .reshape(nb * vp, tp, co)
        xfs.append(xf_v)
        ddt = jnp.float32 if dtype is None else dtype
        def mix_tm(scr, k=k):
            for ri in range(red):
                qs = qk_t[:, k * 2 * red + ri, :].reshape(nb, tp, vp)
                kk = qk_t[:, k * 2 * red + red + ri, :].reshape(nb, tp, vp)
                if dtype is not None:
                    qs, kk = qs.astype(dtype), kk.astype(dtype)
                scr[:, :, :, ri * vp:(ri + 1) * vp] = \
                    qs[:, :, None, :] - kk[:, None, :, :]
            s = jnp.tanh(scr[:])
            w2 = wrm2[k] if dtype is None else wrm2[k].astype(dtype)
            return jnp.dot(s.reshape(nb * tp * tp, red * vp), w2,
                           preferred_element_type=jnp.float32)
        dyn = pl.run_scoped(mix_tm,
                            pltpu.VMEM((nb, tp, tp, red * vp), ddt))
        adj = dyn.reshape(nb, tp, tp, vp)
        adj = (adj + brm[k]) * alpha + base[k][None]
        adj = jnp.transpose(adj, (0, 3, 1, 2))            # (nb, w, tq, tu)
        adj_v = adj.reshape(nb * vp, tp, tp)
        if agg == "right":
            adj_v = jnp.swapaxes(adj_v, 1, 2)
        adjs.append(adj_v)
    adj_cat = adjs[0] if kt == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if kt == 1 else jnp.concatenate(xfs, axis=1)
    out_v = jax.lax.dot_general(adj_cat, xf_cat,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    out = jnp.swapaxes(out_v.reshape(nb, vp, tp, co), 1, 2)
    return out.reshape(nb * tp * vp, co) * jmask


def _var_kernel(x_ref, sb, sa, swf, sbf, swqk, sbqk, swrm, sbrm,
                tb, ta, twf, tbf, twqk, tbqk, twrm, tbrm, out_ref,
                *, ks, kt, red, agg, v_real, t_real, variant, dtype=None):
    nb, tp, vp, cin = x_ref.shape
    jmask = fk._row_mask(nb * tp * vp, tp, vp, t_real, v_real)

    @pl.when(pl.program_id(1) == 0)
    def _seed():
        out_ref[:] = x_ref[:]

    x2 = out_ref[:].reshape(nb * tp * vp, cin)
    y2 = _spatial_v(x2, nb, tp, vp, cin, jmask, ks, red, agg, variant,
                    sb[0], sa[0, 0, 0], swf[0], sbf[0], swqk[0], sbqk[0],
                    swrm[0], sbrm[0], dtype)
    z2 = _temporal_v(y2, nb, tp, vp, cin, jmask, kt, red, agg, variant,
                     tb[0], ta[0, 0, 0], twf[0], tbf[0], twqk[0], tbqk[0],
                     twrm[0], tbrm[0], dtype)
    out_ref[:] = z2.reshape(nb, tp, vp, cin)


def chain_variant(x, blocks_params, agg, variant, nb=None, dtype=None):
    n, t, v, cin = x.shape
    vp, tp = -(-v // 8) * 8, -(-t // 8) * 8
    if nb is None:
        nb = fk._block_samples(n)
    sp0, tp0 = blocks_params[0]
    ks, kt, red = sp0[2].shape[0], tp0[2].shape[0], sp0[4].shape[-1]

    def stack(prep):
        return [jnp.stack(a) for a in zip(*[prep(s, tt)
                                            for s, tt in blocks_params])]

    def merge_wf(wf, bf):
        """(K, Ci, Co) -> (Ci, K*Co) merged projection panel."""
        k = wf.shape[0]
        return (jnp.concatenate([wf[i] for i in range(k)], axis=1),
                jnp.concatenate([bf[i] for i in range(k)], axis=0)[None, :])

    def prep_s(s, _):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        base_p = fk._pad_to(fk._pad_to(base, 1, vp), 2, vp)
        if agg == "right":
            base_p = jnp.swapaxes(base_p, 1, 2)
        wqk, bqk = fk._stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = fk._pad_to(fk._pad_to(wrm, 2, tp), 3, tp)
        # host-side pairing: (K, R, Tp, Tp) -> (K, R*Tp, Tp)
        wrm2 = wrm_p.reshape(wrm_p.shape[0], -1, wrm_p.shape[-1])
        brm_p = fk._pad_to(brm, 1, tp)[:, None, None, :]
        wfm, bfm = merge_wf(wf, bf)
        return (base_p[..., None], jnp.asarray(alpha, jnp.float32)
                .reshape(1, 1), wfm, bfm, wqk, bqk, wrm2, brm_p)

    def prep_t(_, s):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        wqk, bqk = fk._stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = fk._pad_to(fk._pad_to(wrm, 2, vp), 3, vp)
        wrm2 = wrm_p.reshape(wrm_p.shape[0], -1, wrm_p.shape[-1])
        base_p = fk._pad_to(fk._pad_to(base, 1, tp), 2, tp)[..., None]
        brm_p = fk._pad_to(brm, 1, vp)[:, None, None, :]
        wfm, bfm = merge_wf(wf, bf)
        return (base_p, jnp.asarray(alpha, jnp.float32).reshape(1, 1),
                wfm, bfm, wqk, bqk, wrm2, brm_p)

    s_args = stack(prep_s)
    t_args = stack(prep_t)
    x_p = fk._pad_to(fk._pad_to(x.astype(jnp.float32), 2, vp), 1, tp)

    def per_block(a):
        nd = a.ndim
        return pl.BlockSpec((1,) + a.shape[1:],
                            lambda i, b, _n=nd: (b,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_var_kernel, ks=ks, kt=kt, red=red, agg=agg,
                          v_real=v, t_real=t, variant=variant, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((n, tp, vp, cin), jnp.float32),
        grid=(n // nb, len(blocks_params)),
        in_specs=[pl.BlockSpec((nb, tp, vp, cin),
                               lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [per_block(a) for a in s_args + t_args],
        out_specs=pl.BlockSpec((nb, tp, vp, cin), lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=fk._vmem_limit()),
        interpret=fk._interpret(),
    )(x_p, *s_args, *t_args)
    return out[:, :t, :v, :]


def attempt(name, fn, tries=2):
    for i in range(tries):
        try:
            t0 = time.time()
            out = fn()
            log(section=name, result=out, wall_s=round(time.time() - t0, 1))
            return out
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {str(e)[:160]}"
            if i + 1 == tries:
                log(section=name, error=msg)
                return None
            log(section=name, retry=msg)
            time.sleep(8)


def main():
    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))
    cb = bench._chain_blocks(params)
    log(device=str(jax.devices()[0]), backend=jax.default_backend())

    want = np.asarray(bench.stacked_forward(params, x))

    def check(vv, nb=None, dtype=None, tol=5e-3):
        got = np.asarray(chain_variant(x, cb, "right", vv, nb, dtype))
        return round(float(np.abs(got - want).max()
                           / (np.abs(want).max() + 1e-9)), 6)

    rel = attempt("sc_relerr", lambda: check("sc"))
    if rel is not None and rel < 5e-3:
        attempt("sc_ms", lambda: round(bench._time_slope(
            lambda xx: chain_variant(xx, cb, "right", "sc"), x) * 1e3, 3))
    rel16 = attempt("sc_bf16s_relerr",
                    lambda: check("sc", dtype=jnp.bfloat16))
    if rel16 is not None and rel16 < 5e-2:
        attempt("sc_bf16s_ms", lambda: round(bench._time_slope(
            lambda xx: chain_variant(xx, cb, "right", "sc",
                                     dtype=jnp.bfloat16), x) * 1e3, 3))
        for nb in (2, 8):
            attempt(f"sc_bf16s_nb{nb}_ms", lambda b=nb: round(
                bench._time_slope(lambda xx: chain_variant(
                    xx, cb, "right", "sc", b, jnp.bfloat16), x) * 1e3, 3))
    log(done=True)


if __name__ == "__main__":
    main()
