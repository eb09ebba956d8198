#!/usr/bin/env python
"""Round-3 probe: redesigned chain-kernel bodies.

Hypothesis (from the r3e ablation: copy floor 0.40 ms vs full 5.57 ms →
~5.2 ms of in-kernel compute): the kernel is VPU-bound on the score
tensors, whose minor dims are 24-40 real lanes of 128 (19-31%% packing),
so ~109M tanh+diff element-ops per forward run at ~4x their packed cost,
and the adjacency relayouts (two chained swapaxes per kernel) add more
VPU traffic.  Variants (all full, valid chain kernels, correctness-checked
vs the oracle before timing):

  perm      : current scores, but ONE jnp.transpose(0,3,1,2) for the
              adjacency relayout instead of two swapaxes
  pair      : R reduction channels paired on lanes -> scores
              (nb, a, b, R*tp) spatial / (nb, t, u, R*vp) temporal; one
              mixing matmul with K doubled; single-permute relayout
  pair_bd   : pair + block-diagonal packed aggregation (pad+concat pack,
              g=5 frames / g=3 joint-groups per matmul)

Run on CPU first (interpreter validates bodies), then TPU.
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


def _bd_pack(adj, g):
    """(m, p, q) -> (m//g, g*p, g*q) block-diagonal via pad+concat
    (lane pads are static; concat is on sublanes)."""
    m, p, q = adj.shape
    a4 = adj.reshape(m // g, g, p, q)
    cols = [jnp.pad(a4[:, j], ((0, 0), (0, 0), (j * q, (g - 1 - j) * q)))
            for j in range(g)]
    return jnp.concatenate(cols, axis=1)


def _spatial_v(x2, nb, tp, vp, cin, jmask, ks, red, agg, variant,
               base, alpha, wf, bf, wqk, bqk, wrm, brm):
    co = wf.shape[-1]
    paired = variant in ("pair", "pair_bd")
    qk = jnp.dot(x2, wqk, preferred_element_type=jnp.float32) + bqk
    qk4 = qk.reshape(nb, tp, vp, ks * 2 * red)
    qk_t = jnp.swapaxes(jnp.swapaxes(qk4, 1, 2), 2, 3)   # (nb, vp, K2R, tp)
    xfs, adjs = [], []
    for k in range(ks):
        xf = jnp.dot(x2, wf[k], preferred_element_type=jnp.float32) + bf[k]
        xfs.append((xf * jmask).reshape(nb * tp, vp, co))
        if paired:
            # R channels side-by-side on lanes via lane-concat (the
            # equivalent reshape-merge hard-crashes Mosaic, probe r6)
            qp = jnp.concatenate(
                [qk_t[:, :, k * 2 * red + ri, :] for ri in range(red)],
                axis=-1)
            kp = jnp.concatenate(
                [qk_t[:, :, k * 2 * red + red + ri, :] for ri in range(red)],
                axis=-1)
            if agg == "right":
                s = jnp.tanh(qp[:, None, :, :] - kp[:, :, None, :])
            else:
                s = jnp.tanh(qp[:, :, None, :] - kp[:, None, :, :])
            dyn = jnp.dot(s.reshape(nb * vp * vp, red * tp),
                          wrm[k].reshape(red * tp, tp),
                          preferred_element_type=jnp.float32)
        else:
            dyn = None
            for ri in range(red):
                qs = qk_t[:, :, k * 2 * red + ri, :]
                kk = qk_t[:, :, k * 2 * red + red + ri, :]
                if agg == "right":
                    s = jnp.tanh(qs[:, None, :, :] - kk[:, :, None, :])
                else:
                    s = jnp.tanh(qs[:, :, None, :] - kk[:, None, :, :])
                d = jnp.dot(s.reshape(nb * vp * vp, tp), wrm[k, ri],
                            preferred_element_type=jnp.float32)
                dyn = d if dyn is None else dyn + d
        adj = dyn.reshape(nb, vp, vp, tp)
        adj = (adj + brm[k]) * alpha + base[k][None]
        adj = jnp.transpose(adj, (0, 3, 1, 2))            # (nb, To, a, b)
        adjs.append(adj.reshape(nb * tp, vp, vp))
    adj_cat = adjs[0] if ks == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if ks == 1 else jnp.concatenate(xfs, axis=1)
    if variant in ("pair_bd", "perm_bd"):
        g = 5
        out = jax.lax.dot_general(
            _bd_pack(adj_cat, g),
            xf_cat.reshape(nb * tp // g, g * ks * vp, co),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out = out.reshape(nb * tp, vp, co)
    else:
        out = jax.lax.dot_general(adj_cat, xf_cat,
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
    return out.reshape(nb * tp * vp, co) * jmask


def _temporal_v(x2, nb, tp, vp, cin, jmask, kt, red, agg, variant,
                base, alpha, wf, bf, wqk, bqk, wrm, brm):
    co = wf.shape[-1]
    paired = variant in ("pair", "pair_bd")
    qk = jnp.dot(x2, wqk, preferred_element_type=jnp.float32) + bqk
    qk3 = qk.reshape(nb * tp, vp, kt * 2 * red)
    qk_t = jnp.swapaxes(qk3, 1, 2)                       # (nb*Tp, K2R, vp)
    xfs, adjs = [], []
    for k in range(kt):
        xf = jnp.dot(x2, wf[k], preferred_element_type=jnp.float32) + bf[k]
        xf = xf * jmask
        xf_v = jnp.swapaxes(xf.reshape(nb, tp, vp, co), 1, 2) \
            .reshape(nb * vp, tp, co)
        xfs.append(xf_v)
        if paired:
            qp = jnp.concatenate(
                [qk_t[:, k * 2 * red + ri, :].reshape(nb, tp, vp)
                 for ri in range(red)], axis=-1)
            kp = jnp.concatenate(
                [qk_t[:, k * 2 * red + red + ri, :].reshape(nb, tp, vp)
                 for ri in range(red)], axis=-1)
            s = jnp.tanh(qp[:, :, None, :] - kp[:, None, :, :])
            dyn = jnp.dot(s.reshape(nb * tp * tp, red * vp),
                          wrm[k].reshape(red * vp, vp),
                          preferred_element_type=jnp.float32)
        else:
            dyn = None
            for ri in range(red):
                qs = qk_t[:, k * 2 * red + ri, :].reshape(nb, tp, vp)
                kk = qk_t[:, k * 2 * red + red + ri, :].reshape(nb, tp, vp)
                s = jnp.tanh(qs[:, :, None, :] - kk[:, None, :, :])
                d = jnp.dot(s.reshape(nb * tp * tp, vp), wrm[k, ri],
                            preferred_element_type=jnp.float32)
                dyn = d if dyn is None else dyn + d
        adj = dyn.reshape(nb, tp, tp, vp)
        adj = (adj + brm[k]) * alpha + base[k][None]
        adj = jnp.transpose(adj, (0, 3, 1, 2))            # (nb, w, tq, tu)
        adj_v = adj.reshape(nb * vp, tp, tp)
        if agg == "right":
            adj_v = jnp.swapaxes(adj_v, 1, 2)
        adjs.append(adj_v)
    adj_cat = adjs[0] if kt == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if kt == 1 else jnp.concatenate(xfs, axis=1)
    if variant in ("pair_bd", "perm_bd"):
        g = 3
        out_v = jax.lax.dot_general(
            _bd_pack(adj_cat, g),
            xf_cat.reshape(nb * vp // g, g * kt * tp, co),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_v = out_v.reshape(nb * vp, tp, co)
    else:
        out_v = jax.lax.dot_general(adj_cat, xf_cat,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
    out = jnp.swapaxes(out_v.reshape(nb, vp, tp, co), 1, 2)
    return out.reshape(nb * tp * vp, co) * jmask


def _var_kernel(x_ref, sb, sa, swf, sbf, swqk, sbqk, swrm, sbrm,
                tb, ta, twf, tbf, twqk, tbqk, twrm, tbrm, out_ref,
                *, ks, kt, red, agg, v_real, t_real, variant):
    nb, tp, vp, cin = x_ref.shape
    jmask = fk._row_mask(nb * tp * vp, tp, vp, t_real, v_real)

    @pl.when(pl.program_id(1) == 0)
    def _seed():
        out_ref[:] = x_ref[:]

    x2 = out_ref[:].reshape(nb * tp * vp, cin)
    y2 = _spatial_v(x2, nb, tp, vp, cin, jmask, ks, red, agg, variant,
                    sb[0], sa[0, 0, 0], swf[0], sbf[0], swqk[0], sbqk[0],
                    swrm[0], sbrm[0])
    z2 = _temporal_v(y2, nb, tp, vp, cin, jmask, kt, red, agg, variant,
                     tb[0], ta[0, 0, 0], twf[0], tbf[0], twqk[0], tbqk[0],
                     twrm[0], tbrm[0])
    out_ref[:] = z2.reshape(nb, tp, vp, cin)


def chain_variant(x, blocks_params, agg, variant, nb=None):
    n, t, v, cin = x.shape
    vp, tp = -(-v // 8) * 8, -(-t // 8) * 8
    if nb is None:
        nb = fk._block_samples(n)
    sp0, tp0 = blocks_params[0]
    ks, kt, red = sp0[2].shape[0], tp0[2].shape[0], sp0[4].shape[-1]

    def stack(prep):
        return [jnp.stack(a) for a in zip(*[prep(s, tt)
                                            for s, tt in blocks_params])]

    def prep_s(s, _):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        base_p = fk._pad_to(fk._pad_to(base, 1, vp), 2, vp)
        if agg == "right":
            base_p = jnp.swapaxes(base_p, 1, 2)
        wqk, bqk = fk._stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = fk._pad_to(fk._pad_to(wrm, 2, tp), 3, tp)
        brm_p = fk._pad_to(brm, 1, tp)[:, None, None, :]
        return (base_p[..., None], jnp.asarray(alpha, jnp.float32)
                .reshape(1, 1), wf, bf[:, None, :], wqk, bqk, wrm_p, brm_p)

    def prep_t(_, s):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        wqk, bqk = fk._stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = fk._pad_to(fk._pad_to(wrm, 2, vp), 3, vp)
        base_p = fk._pad_to(fk._pad_to(base, 1, tp), 2, tp)[..., None]
        brm_p = fk._pad_to(brm, 1, vp)[:, None, None, :]
        return (base_p, jnp.asarray(alpha, jnp.float32).reshape(1, 1),
                wf, bf[:, None, :], wqk, bqk, wrm_p, brm_p)

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
                          v_real=v, t_real=t, variant=variant),
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

    want = None
    variants = ("perm", "pair", "perm_bd", "pair_bd")
    for vv in variants:
        def check(vv=vv):
            nonlocal want
            if want is None:
                want = np.asarray(bench.stacked_forward(params, x))
            got = np.asarray(chain_variant(x, cb, "right", vv))
            return round(float(np.abs(got - want).max()
                               / (np.abs(want).max() + 1e-9)), 6)
        rel = attempt(f"{vv}_relerr", check)
        if rel is None or rel > 5e-3:
            continue
        if jax.default_backend() == "tpu":
            attempt(f"{vv}_ms", lambda vv=vv: round(bench._time_slope(
                lambda xx: chain_variant(xx, cb, "right", vv), x) * 1e3, 3))
    if jax.default_backend() == "tpu":
        for nb in (8, 16):
            attempt(f"pair_bd_nb{nb}_ms", lambda b=nb: round(
                bench._time_slope(lambda xx: chain_variant(
                    xx, cb, "right", "pair_bd", b), x) * 1e3, 3))
    log(done=True)


if __name__ == "__main__":
    main()
