#!/usr/bin/env python
"""Consolidated TPU measurement harness for the dstdgcn_tpu perf work.

One parameterized script replacing the round-1..3 probe_mosaic*/probe_r*
one-offs (archived in scripts/archive/).  Subcommands:

  python scripts/probe.py chain    # whole-chain kernel variants + ablation
  python scripts/probe.py train    # train-step attribution (remat x bf16)
  python scripts/probe.py all

Every measurement is appended incrementally to /tmp/probe_results.jsonl
(and echoed) so partial runs survive compile-service flakes.  Timing uses
bench._time_slope (two-point fori_loop slope; cancels the tunneled chip's
fixed dispatch cost).

The ``chain`` subcommand builds a PARAMETERIZED variant of the shipping
whole-chain kernel (kernels/fused.py::_chain_grid_kernel) with these axes:

  pad_t      pad frames 35->40 (shipping behavior) or keep T=35 — every
             reshape that touches T merges/splits MAJOR dims, so only V
             needs the sublane pad; dropping the T pad removes ~23%% of the
             temporal score work and the pad/slice dance
  merge_wf   emit BOTH spatial feature projections from ONE (C, K*C)
             matmul (128 lanes, a full MXU tile) instead of two 64-lane
             matmuls, then re-batch with one sublane transpose
  gagg       (gs, gt) in-kernel block-diagonal grouped aggregation: pack
             gs frames / gt joints per matmul so the tiny per-(n,frame)
             V x V aggregation becomes ~128-wide MXU matmuls (the XLA-path
             winner from ops/dstd.py, folded into the kernel)
  ablate     stage knock-outs for cost attribution: copy / nodyn / noagg /
             notanh / noqk
  nb         samples per grid program
  dtype      cast MXU dot inputs (bf16; f32 accumulation)

Non-ablated variants are allclose-checked against ops.dstd on device
before timing.
"""

import argparse
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

import bench  # noqa: E402  (repo-root harness: params, slope timing)
from dstdgcn_tpu.kernels.fused import (_dot_fn, _pad_to, _row_mask,  # noqa: E402
                                       _stack_qk, _vmem_limit)

OUT_PATH = os.environ.get("PROBE_OUT", "/tmp/probe_results.jsonl")
INTERPRET = jax.default_backend() != "tpu"


def emit(name, value, **extra):
    rec = {"name": name, "value": value, **extra}
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT_PATH, "a") as f:
        f.write(line + "\n")


def measure(name, fn, x0, **extra):
    try:
        sec = bench._with_retry(lambda: bench._time_slope(fn, x0))
        emit(name, round(sec * 1e3, 3), unit="ms", **extra)
        return sec
    except Exception as e:  # noqa: BLE001
        emit(name, None, error=f"{type(e).__name__}: {str(e)[:200]}", **extra)
        return None


# --------------------------------------------------------------- chain --


def _block_diag(a3, g):
    """(B, P, P) -> (B//g, g*P, g*P) block-diagonal (ops._block_diag_batch
    restated for the kernel body)."""
    b, p, _ = a3.shape
    a4 = a3.reshape(b // g, g, p, p)
    eye = jnp.eye(g, dtype=a3.dtype)
    bd = a4[:, :, :, None, :] * eye[:, None, :, None]
    return bd.reshape(b // g, g * p, g * p)


def _spatial_stage(x2, nb, tp, vp, jmask, ks, red, dot, opt,
                   base_ref, alpha_ref, wf_ref, bf_ref, wqk_ref, bqk_ref,
                   wrm_ref, brm_ref):
    co = x2.shape[-1]       # chain: constant channel width
    alpha = alpha_ref[0, 0, 0]
    ab = opt.get("ablate")
    dot_p = _dot_fn(jnp.bfloat16) if opt.get("proj_bf16") else dot
    agg_dg = opt.get("agg_dg")

    # ---- feature projection(s)
    if opt.get("merge_wf") and ks > 1:
        # wf_ref here is the host-merged (1, C, K*C) panel: ONE full-lane
        # (128-wide) matmul, then lane slices per kernel (no 4D swap — the
        # swap formulation crashes the Mosaic compiler)
        xf_all = dot_p(x2, wf_ref[0]) + bf_ref[0]
        xf_all = xf_all * jmask
        xfs = [xf_all[:, k * co:(k + 1) * co].reshape(nb * tp, vp, co)
               for k in range(ks)]
        xf_cat = jnp.concatenate(xfs, axis=1)
    else:
        xfs = []
        for k in range(ks):
            xf = dot_p(x2, wf_ref[0, k]) + bf_ref[0, k]
            xfs.append((xf * jmask).reshape(nb * tp, vp, co))
        xf_cat = xfs[0] if ks == 1 else jnp.concatenate(xfs, axis=1)

    if ab == "projonly":
        # skip scores AND aggregation: fold kernels by sum
        y = xf_cat.reshape(nb * tp, ks, vp, co).sum(axis=1)
        return y.reshape(nb * tp * vp, co)

    # ---- dynamic adjacency
    adjs = []
    if ab in ("nodyn", "noqk"):
        keep = jnp.float32(0.0)
        if ab == "nodyn":
            # projection cost only; *1e-30 keeps it alive past DCE
            qk = dot(x2, wqk_ref[0]) + bqk_ref[0]
            keep = qk[0, 0] * 1e-30
        for k in range(ks):
            adj = base_ref[0, k, :, :, 0][None] + keep
            adjs.append(jnp.broadcast_to(adj, (nb * tp, vp, vp)))
    else:
        qk = dot(x2, wqk_ref[0]) + bqk_ref[0]
        qk4 = qk.reshape(nb, tp, vp, ks * 2 * red)
        qk_t = jnp.swapaxes(jnp.swapaxes(qk4, 1, 2), 2, 3)  # (nb,vp,K2R,tp)
        act = (lambda z: z) if ab == "notanh" else jnp.tanh
        for k in range(ks):
            dyn = None
            for ri in range(red):
                qs = qk_t[:, :, k * 2 * red + ri, :]
                kk = qk_t[:, :, k * 2 * red + red + ri, :]
                s = act(qs[:, None, :, :] - kk[:, :, None, :])  # agg=right
                d = dot(s.reshape(nb * vp * vp, tp), wrm_ref[0, k, ri])
                dyn = d if dyn is None else dyn + d
            adj = dyn.reshape(nb, vp, vp, tp)
            adj = (adj + brm_ref[0, k]) * alpha + base_ref[0, k][None]
            if agg_dg:
                adjs.append(adj)                    # stay (nb, a, b, tp)
            else:
                adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)
                adjs.append(adj.reshape(nb * tp, vp, vp))

    # ---- aggregation
    if agg_dg:
        # direct dot_general: batch dims (nb, t) referenced in place — no
        # adjacency re-batch transposes.  adj (nb, a=w, b=v, t) contracts v
        # against xf (nb, t, v, c); out (nb, t, w, c).
        assert ab is None, "agg_dg not combined with ablations"
        out4 = None
        for k in range(ks):
            xf4 = xfs[k].reshape(nb, tp, vp, co)
            o = dot(adjs[k], xf4, (((2,), (2,)), ((0, 3), (0, 1))))
            out4 = o if out4 is None else out4 + o  # (nb, t, w, c)
        return out4.reshape(nb * tp * vp, co) * jmask
    gs = (opt.get("gagg") or (None, None))[0]
    if gs:
        adj_cat = jnp.concatenate([_block_diag(a, gs) for a in adjs], axis=2) \
            if ks > 1 else _block_diag(adjs[0], gs)
        xf_g = [xf.reshape(nb * tp // gs, gs * vp, co) for xf in xfs]
        xf_cat2 = jnp.concatenate(xf_g, axis=1) if ks > 1 else xf_g[0]
        out = dot(adj_cat, xf_cat2, (((2,), (1,)), ((0,), (0,))))
        out = out.reshape(nb * tp * vp, co)
    else:
        adj_cat = adjs[0] if ks == 1 else jnp.concatenate(adjs, axis=2)
        out = dot(adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))))
        out = out.reshape(nb * tp * vp, co)
    return out * jmask


def _temporal_stage(x2, nb, tp, vp, jmask, kt, red, dot, opt,
                    base_ref, alpha_ref, wf_ref, bf_ref, wqk_ref, bqk_ref,
                    wrm_ref, brm_ref):
    co = x2.shape[-1]
    alpha = alpha_ref[0, 0, 0]
    ab = opt.get("ablate")
    dot_p = _dot_fn(jnp.bfloat16) if opt.get("proj_bf16") else dot
    agg_dg = opt.get("agg_dg")

    xfs, xf4s = [], []
    for k in range(kt):
        xf = dot_p(x2, wf_ref[0, k]) + bf_ref[0, k]
        xf = xf * jmask
        if agg_dg:
            xf4s.append(xf.reshape(nb, tp, vp, co))
            continue
        xf_v = jnp.swapaxes(xf.reshape(nb, tp, vp, co), 1, 2) \
            .reshape(nb * vp, tp, co)
        xfs.append(xf_v)
    xf_cat = None if agg_dg else (xfs[0] if kt == 1
                                  else jnp.concatenate(xfs, axis=1))

    if ab == "projonly":
        out_v = xf_cat.reshape(nb * vp, kt, tp, co).sum(axis=1)
        out = jnp.swapaxes(out_v.reshape(nb, vp, tp, co), 1, 2)
        return out.reshape(nb * tp * vp, co)

    adjs = []
    if ab in ("nodyn", "noqk"):
        keep = jnp.float32(0.0)
        if ab == "nodyn":
            qk = dot(x2, wqk_ref[0]) + bqk_ref[0]
            keep = qk[0, 0] * 1e-30
        for k in range(kt):
            adj = jnp.swapaxes(base_ref[0, k, :, :, 0], 0, 1)[None] + keep
            adjs.append(jnp.broadcast_to(adj, (nb * vp, tp, tp)))
    else:
        qk = dot(x2, wqk_ref[0]) + bqk_ref[0]
        qk3 = qk.reshape(nb * tp, vp, kt * 2 * red)
        qk_t = jnp.swapaxes(qk3, 1, 2)
        act = (lambda z: z) if ab == "notanh" else jnp.tanh
        for k in range(kt):
            dyn = None
            for ri in range(red):
                qs = qk_t[:, k * 2 * red + ri, :].reshape(nb, tp, vp)
                kk = qk_t[:, k * 2 * red + red + ri, :].reshape(nb, tp, vp)
                s = act(qs[:, :, None, :] - kk[:, None, :, :])
                d = dot(s.reshape(nb * tp * tp, vp), wrm_ref[0, k, ri])
                dyn = d if dyn is None else dyn + d
            adj = dyn.reshape(nb, tp, tp, vp)
            adj = (adj + brm_ref[0, k]) * alpha + base_ref[0, k][None]
            if agg_dg:
                adjs.append(adj)                 # stay (nb, t, u, vp)
                continue
            adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)
            adj_v = adj.reshape(nb * vp, tp, tp)
            adj_v = jnp.swapaxes(adj_v, 1, 2)   # agg=right
            adjs.append(adj_v)
    if agg_dg:
        assert ab is None
        out4 = None
        for k in range(kt):
            # contract source frames t in place: batch (nb, v); the only
            # remaining relayout is the (nb, v, u, c) -> (nb, u, v, c) swap
            o = dot(adjs[k], xf4s[k], (((1,), (1,)), ((0, 3), (0, 2))))
            out4 = o if out4 is None else out4 + o
        out = jnp.swapaxes(out4, 1, 2)           # (nb, u, v, c)
        return out.reshape(nb * tp * vp, co) * jmask
    adj_cat = adjs[0] if kt == 1 else jnp.concatenate(adjs, axis=2)

    gt = (opt.get("gagg") or (None, None))[1]
    if gt and vp % gt == 0:
        adj_cat = _block_diag(adj_cat, gt)
        xf_cat = xf_cat.reshape(nb * vp // gt, gt * tp, co)
        out_v = dot(adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))))
        out_v = out_v.reshape(nb * vp, tp, co)
    else:
        out_v = dot(adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))))
    out = jnp.swapaxes(out_v.reshape(nb, vp, tp, co), 1, 2)
    return out.reshape(nb * tp * vp, co) * jmask


def _variant_kernel(x_ref, sb, sa, swf, sbf, swqk, sbqk, swrm, sbrm,
                    tb, ta, twf, tbf, twqk, tbqk, twrm, tbrm, out_ref,
                    *, ks, kt, red, v_real, t_real, opt):
    nb, tp, vp, cin = x_ref.shape
    dot = _dot_fn(opt.get("dtype"))
    jmask = _row_mask(nb * tp * vp, tp, vp, t_real, v_real)

    @pl.when(pl.program_id(1) == 0)
    def _seed():
        out_ref[:] = x_ref[:]

    if opt.get("ablate") == "copy":
        out_ref[:] = x_ref[:]
        return

    x2 = out_ref[:].reshape(nb * tp * vp, cin)
    y2 = _spatial_stage(x2, nb, tp, vp, jmask, ks, red, dot, opt,
                        sb, sa, swf, sbf, swqk, sbqk, swrm, sbrm)
    z2 = _temporal_stage(y2, nb, tp, vp, jmask, kt, red, dot, opt,
                         tb, ta, twf, tbf, twqk, tbqk, twrm, tbrm)
    out_ref[:] = z2.reshape(nb, tp, vp, cin)


def chain_variant(x, blocks_params, *, nb=4, pad_t=True, merge_wf=False,
                  gagg=None, ablate=None, dtype=None, proj_bf16=False,
                  agg_dg=False, dimsem=None):
    """Parameterized whole-chain kernel (forward only, timing use)."""
    n, t, v, cin = x.shape
    vp = -(-v // 8) * 8
    tp = -(-t // 8) * 8 if pad_t else t
    sp0, tp0 = blocks_params[0]
    ks, kt, red = sp0[2].shape[0], tp0[2].shape[0], sp0[4].shape[-1]
    opt = dict(merge_wf=merge_wf, gagg=gagg, ablate=ablate, dtype=dtype,
               proj_bf16=proj_bf16, agg_dg=agg_dg)

    def prep_s(s):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        base_p = _pad_to(_pad_to(base, 1, vp), 2, vp)
        base_p = jnp.swapaxes(base_p, 1, 2)        # agg=right kernel layout
        wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = _pad_to(_pad_to(wrm, 2, tp), 3, tp)
        brm_p = _pad_to(brm, 1, tp)[:, None, None, :]
        if merge_wf and ks > 1:
            # one (C, K*C) panel; bf packed to (1, K*C)
            wf_m = jnp.concatenate([wf[k] for k in range(ks)], axis=1)
            bf_m = jnp.concatenate([bf[k] for k in range(ks)])[None, :]
        else:
            wf_m, bf_m = wf, bf[:, None, :]
        return (base_p[..., None], jnp.asarray(alpha, jnp.float32)
                .reshape(1, 1), wf_m, bf_m, wqk, bqk, wrm_p, brm_p)

    def prep_t(s):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = _pad_to(_pad_to(wrm, 2, vp), 3, vp)
        base_p = _pad_to(_pad_to(base, 1, tp), 2, tp)[..., None]
        brm_p = _pad_to(brm, 1, vp)[:, None, None, :]
        return (base_p, jnp.asarray(alpha, jnp.float32).reshape(1, 1),
                wf, bf[:, None, :], wqk, bqk, wrm_p, brm_p)

    s_args = [jnp.stack(a) for a in zip(*[prep_s(s) for s, _ in
                                          blocks_params])]
    t_args = [jnp.stack(a) for a in zip(*[prep_t(tt) for _, tt in
                                          blocks_params])]
    x_p = _pad_to(_pad_to(x.astype(jnp.float32), 2, vp), 1, tp)

    def per_block(a):
        nd = a.ndim
        return pl.BlockSpec((1,) + a.shape[1:],
                            lambda i, b, _n=nd: (b,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_variant_kernel, ks=ks, kt=kt, red=red,
                          v_real=v, t_real=t, opt=opt),
        out_shape=jax.ShapeDtypeStruct((n, tp, vp, cin), jnp.float32),
        grid=(n // nb, len(blocks_params)),
        in_specs=[pl.BlockSpec((nb, tp, vp, cin), lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [per_block(a) for a in s_args + t_args],
        out_specs=pl.BlockSpec((nb, tp, vp, cin), lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dimsem or ("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=INTERPRET,
    )(x_p, *s_args, *t_args)
    return out[:, :t, :v, :]


def run_chain2(args):
    """Second-wave chain variants from the first-wave attribution: the
    5.65 ms (nb4) chain splits into pipeline 0.47 / projections 1.85 /
    score+mix+relayout ~2.2 / aggregation 0.61 / qk 0.08.  Targets:
    projection MXU rate (proj_bf16, merge_wf via lane slices), the
    adjacency re-batch transposes (agg_dg: in-place dot_general batch
    dims), and grid pipelining (dimsem parallel over samples)."""
    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    cb = bench._chain_blocks(params)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))
    want = np.asarray(bench.stacked_forward(params, x))
    ref = float(np.abs(want).max())

    def check(name, fn):
        try:
            got = np.asarray(jax.jit(fn)(x))
        except Exception as e:  # noqa: BLE001
            emit(f"check_{name}", None,
                 error=f"{type(e).__name__}: {str(e)[:160]}")
            return False
        err = float(np.abs(got - want).max()) / max(ref, 1.0)
        emit(f"check_{name}", err, unit="rel_err")
        return err < 2e-2

    variants = [
        ("c2_dimsem_par", dict(nb=4, dimsem=("parallel", "arbitrary"))),
        ("c2_projbf16", dict(nb=4, proj_bf16=True)),
        ("c2_aggdg", dict(nb=4, agg_dg=True)),
        ("c2_mwf_slice", dict(nb=4, merge_wf=True)),
        ("c2_projbf16_aggdg", dict(nb=4, proj_bf16=True, agg_dg=True)),
        ("c2_projbf16_aggdg_mwf",
         dict(nb=4, proj_bf16=True, agg_dg=True, merge_wf=True)),
        ("c2_projbf16_aggdg_par",
         dict(nb=4, proj_bf16=True, agg_dg=True,
              dimsem=("parallel", "arbitrary"))),
        ("c2_aggdg_nb8", dict(nb=8, agg_dg=True)),
    ]
    for name, kw in variants:
        fn = lambda xx, _kw=kw: chain_variant(xx, cb, **_kw)
        if check(name, fn):
            measure(name, fn, x)
    measure("c2_xla_bd_bf16",
            lambda xx: bench.stacked_forward(params, xx, dtype=jnp.bfloat16,
                                             agg_group_s=5, agg_group_t=3),
            x)


def run_chain3(args):
    """Final chain wave: tiny sample blocks (deeper grid pipeline), plus an
    XLA-side agg_group sweep and a batch-256 scaling point."""
    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    cb = bench._chain_blocks(params)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))

    for name, kw in [("c3_chain_nb2", dict(nb=2)),
                     ("c3_chain_nb1", dict(nb=1))]:
        fn = lambda xx, _kw=kw: chain_variant(xx, cb, **_kw)
        measure(name, fn, x)

    for gs, gt in [(7, 3), (5, 4), (7, 4), (5, 2), (5, 6)]:
        measure(f"c3_xla_bf16_g{gs}_{gt}",
                lambda xx, _g=(gs, gt): bench.stacked_forward(
                    params, xx, dtype=jnp.bfloat16, agg_group_s=_g[0],
                    agg_group_t=_g[1]), x)
    measure("c3_xla_bf16_g53_flatT",
            lambda xx: bench.stacked_forward(
                params, xx, dtype=jnp.bfloat16, pair_flat="temporal",
                agg_group_s=5, agg_group_t=3), x)
    x256 = jnp.asarray(rng.randn(256, t, v, c).astype(np.float32))
    sec = measure("c3_xla_bf16_g53_n256",
                  lambda xx: bench.stacked_forward(
                      params, xx, dtype=jnp.bfloat16, agg_group_s=5,
                      agg_group_t=3), x256)
    if sec:
        emit("c3_edges_per_s_n256",
             round(bench._edges_per_forward(256, t, v, blocks) / sec, 1))


def run_train3(args):
    """Fused-inverse experiment: run BOTH inverse-training directions in
    ONE model call (batch 2N).  Changes BatchNorm train-mode statistics
    (joint over both directions instead of sequential per-direction) —
    measured here to decide whether it is worth shipping as an opt-in
    knob.  Reference semantics: prediction.py:267-287 (two sequential
    calls)."""
    import optax

    from dstdgcn_tpu.models import DSTDGCN

    model = DSTDGCN(input_channels=6, input_time_frame=10,
                    output_time_frame=25, st_gcnn_dropout=0.1,
                    joints_to_consider=22, num_feature=64, num_layers=5,
                    layout="h36m", compute_dtype="bfloat16",
                    agg_group_spatial=5, agg_group_temporal=3,
                    pair_flat=True)
    rng = np.random.RandomState(0)
    n = 128
    x = jnp.asarray(rng.randn(n, 35, 22, 3), jnp.float32)
    x_inv = x[:, ::-1]
    tgt = jnp.asarray(rng.randn(n, 35, 22, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x[:1], train=True)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    def loss_fn(p, st, key):
        xx = jnp.concatenate([x, x_inv], axis=0)
        out, mut = model.apply({"params": p, "batch_stats": st}, xx,
                               train=True, rngs={"dropout": key},
                               mutable=["batch_stats"])
        o_f, o_i = out[:n], out[n:]
        l_f = jnp.mean(jnp.linalg.norm(o_f - tgt, axis=-1))
        l_i = jnp.mean(jnp.linalg.norm(o_i - tgt[:, ::-1], axis=-1))
        return (l_f + l_i) / 2, mut["batch_stats"]

    @jax.jit
    def step(carry, i):
        p, st, os_, key = carry
        key, sub = jax.random.split(key)
        (l, st2), g = jax.value_and_grad(loss_fn, has_aux=True)(p, st, sub)
        up, os2 = tx.update(g, os_, p)
        return (optax.apply_updates(p, up), st2, os2, key), l

    def run(iters):
        def f(carry):
            return jax.lax.fori_loop(
                0, iters, lambda i, c: step(c, i)[0], carry)
        jf = jax.jit(f)
        c0 = (params, stats, opt_state, jax.random.key(1))
        jax.block_until_ready(jf(c0))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(jf(c0))
            best = min(best, time.time() - t0)
        return best

    try:
        sec = max((run(13) - run(3)) / 10, 1e-9)
        emit("train_concat_inverse_bf16_gagg_flat", round(sec * 1e3, 3),
             unit="ms")
    except Exception as e:  # noqa: BLE001
        emit("train_concat_inverse_bf16_gagg_flat", None,
             error=f"{type(e).__name__}: {str(e)[:200]}")


def run_chain4(args):
    """Zoom on the agg_group minimum found by chain3 (g_t=2 beat g_t=3 by
    11%) + train rows at the winner."""
    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))

    for gs, gt in [(5, 2), (5, 1), (1, 2), (1, 1), (5, 11)]:
        measure(f"c4_xla_bf16_g{gs}_{gt}",
                lambda xx, _g=(gs, gt): bench.stacked_forward(
                    params, xx, dtype=jnp.bfloat16,
                    agg_group_s=None if _g[0] == 1 else _g[0],
                    agg_group_t=None if _g[1] == 1 else _g[1]), x)
    measure("c4_xla_bf16_g52_flatS",
            lambda xx: bench.stacked_forward(
                params, xx, dtype=jnp.bfloat16, pair_flat="spatial",
                agg_group_s=5, agg_group_t=2), x)

    for name, pf, g in [
        ("train_bf16_g52_flat", True, (5, 2)),
        ("train_bf16_g52", False, (5, 2)),
        ("train_bf16_g51_flat", True, (5, None)),
    ]:
        try:
            sec = bench._with_retry(
                lambda _pf=pf, _g=g: bench.bench_train_step(
                    128, use_pallas=False, compute_dtype="bfloat16",
                    agg_group=_g, pair_flat=_pf))
            emit(name, round(sec * 1e3, 3), unit="ms")
        except Exception as e:  # noqa: BLE001
            emit(name, None, error=f"{type(e).__name__}: {str(e)[:200]}")


def run_xattr(args):
    """Stage attribution of the WINNING XLA formulation (bf16 + (5,2)
    grouped aggregation): where do its 4.6 ms go?  Ablates the spatial op
    (the 3.2 ms half) the same way the chain-kernel ablation did —
    adjacency = base only (alpha=0 fast-path via zero wrm/alpha still
    computes scores, so instead substitute stripped op variants)."""
    from dstdgcn_tpu.ops import dstd as xops

    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))
    bf16 = jnp.bfloat16

    def spatial_stripped(xx, p, stage):
        """stage: 'projagg' (xf + base-adj aggregation), 'noscore'
        (xf + qk proj + base-adj agg), 'full'."""
        kk = p["wf_s"].shape[0]
        xf = xops._cast(xops._project(xx, p["wf_s"], p["bf_s"], bf16), bf16)
        if stage == "full":
            dyn = xops.dyn_adjacency_spatial(
                xx, p["wm1_s"], p["bm1_s"], p["wm2_s"], p["bm2_s"],
                p["wrm_s"], p["brm_s"], None, bf16)
            adj = xops._cast(dyn, bf16) * jnp.asarray(0.5, bf16) \
                + xops._cast(p["base_s"], bf16)[:, None, None]
        else:
            keep = jnp.float32(0.0)
            if stage == "noscore":
                qk = xops._project(
                    xx, jnp.concatenate([p["wm1_s"], p["wm2_s"]], -1),
                    jnp.concatenate([p["bm1_s"], p["bm2_s"]], -1), bf16)
                keep = qk[0, 0, 0, 0, 0] * 1e-30
            adj = jnp.broadcast_to(
                (xops._cast(p["base_s"], bf16) + keep)[:, None, None],
                (kk, xx.shape[0], xx.shape[1], v, v))
        return xops.aggregate_spatial_grouped(xf, adj, 5, "right", bf16) \
            .astype(bf16)

    for stage in ("projagg", "noscore", "full"):
        def fwd(xx, _s=stage):
            for p in params:
                xx = spatial_stripped(xx, p, _s)
                xx = xops.dstd_temporal(
                    xx, p["base_t"], p["alpha_t"], p["wf_t"], p["bf_t"],
                    p["wm1_t"], p["bm1_t"], p["wm2_t"], p["bm2_t"],
                    p["wrm_t"], p["brm_t"], None, "right", bf16,
                    agg_group=2)
            return xx.astype(jnp.float32)
        measure(f"xattr_spatial_{stage}", fwd, x)


def run_chain(args):
    n, t, v, c, blocks = 128, 35, 22, 64, 7
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, blocks, c, t, v)
    cb = bench._chain_blocks(params)
    x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))

    # reference outputs for correctness
    want = np.asarray(bench.stacked_forward(params, x))
    ref = float(np.abs(want).max())

    def check(name, fn):
        try:
            got = np.asarray(jax.jit(fn)(x))
        except Exception as e:  # noqa: BLE001
            emit(f"check_{name}", None,
                 error=f"{type(e).__name__}: {str(e)[:200]}")
            return False
        err = float(np.abs(got - want).max()) / max(ref, 1.0)
        emit(f"check_{name}", err, unit="rel_err")
        return err < 2e-2

    # NOTE pad_t=False measured 9.04 ms vs 5.58 padded (nopadT_nb4): the
    # T=35 lane dims force slow Mosaic transposes — keep the T pad.  All
    # structural variants therefore run on the padded base.
    variants = [
        ("chain_v0_nb4", dict(nb=4)),                       # shipping ctrl
        ("chain_nopadT_nb4", dict(nb=4, pad_t=False)),      # for the record
        ("chain_nb8", dict(nb=8)),
        ("chain_nb16", dict(nb=16)),
        ("chain_mwf_nb4", dict(nb=4, merge_wf=True)),
        ("chain_gagg_nb4", dict(nb=4, gagg=(5, 3))),
        ("chain_mwf_gagg_nb4", dict(nb=4, merge_wf=True, gagg=(5, 3))),
        ("chain_mwf_gagg_nb8", dict(nb=8, merge_wf=True, gagg=(5, 3))),
    ]
    for name, kw in variants:
        fn = lambda xx, _kw=kw: chain_variant(xx, cb, **_kw)
        if check(name, fn):
            measure(name, fn, x)

    # ablations on the shipping (padded) nb4 base
    for ab in ("copy", "projonly", "noqk", "nodyn", "notanh"):
        fn = lambda xx, _ab=ab: chain_variant(xx, cb, nb=4, ablate=_ab)
        measure(f"chain_ablate_{ab}", fn, x)

    # bf16 dots on the best structural variant
    for name, kw in [("chain_bf16_nb4", dict(nb=4, dtype=jnp.bfloat16)),
                     ("chain_mwf_gagg_bf16_nb4",
                      dict(nb=4, merge_wf=True, gagg=(5, 3),
                           dtype=jnp.bfloat16))]:
        fn = lambda xx, _kw=kw: chain_variant(xx, cb, **_kw)
        if check(name, fn):
            measure(name, fn, x)

    # calibration rows
    measure("xla_bd_bf16",
            lambda xx: bench.stacked_forward(params, xx, dtype=jnp.bfloat16,
                                             agg_group_s=5, agg_group_t=3),
            x)
    # hybrid: fused-spatial per-op kernel + XLA temporal (bd+bf16)
    from dstdgcn_tpu.kernels import fused as fk
    from dstdgcn_tpu.ops import dstd as xops

    def hybrid(xx):
        for p in params:
            xx = fk.dstd_spatial(xx, p["base_s"], p["alpha_s"], p["wf_s"],
                                 p["bf_s"], p["wm1_s"], p["bm1_s"],
                                 p["wm2_s"], p["bm2_s"], p["wrm_s"],
                                 p["brm_s"], None, "right")
            xx = xops.dstd_temporal(xx, p["base_t"], p["alpha_t"], p["wf_t"],
                                    p["bf_t"], p["wm1_t"], p["bm1_t"],
                                    p["wm2_t"], p["bm2_t"], p["wrm_t"],
                                    p["brm_t"], None, "right",
                                    dtype=jnp.bfloat16, agg_group=3)
        return xx.astype(jnp.float32)

    if check("hybrid_fspatial_xtemporal", hybrid):
        measure("hybrid_fspatial_xtemporal", hybrid, x)


# --------------------------------------------------------------- train --


def run_train(args):
    rows = [
        ("train_f32", dict(use_pallas=False)),
        ("train_bf16_gagg", dict(use_pallas=False, compute_dtype="bfloat16",
                                 agg_group=(5, 3))),
        ("train_remat_f32", dict(use_pallas=False, remat=True)),
        ("train_remat_bf16_gagg",
         dict(use_pallas=False, compute_dtype="bfloat16", agg_group=(5, 3),
              remat=True)),
    ]
    for name, kw in rows:
        try:
            sec = bench._with_retry(lambda _kw=kw:
                                    bench.bench_train_step(128, **_kw))
            emit(name, round(sec * 1e3, 3), unit="ms")
        except Exception as e:  # noqa: BLE001
            emit(name, None, error=f"{type(e).__name__}: {str(e)[:200]}")

    # train-mode forward alone (BN batch stats + dropout), for attribution
    import jax.random as jrandom

    from dstdgcn_tpu.models import DSTDGCN

    for name, mkw in [
        ("fwd_train_f32", {}),
        ("fwd_train_bf16_gagg", dict(compute_dtype="bfloat16",
                                     agg_group_spatial=5,
                                     agg_group_temporal=3)),
    ]:
        model = DSTDGCN(input_channels=6, input_time_frame=10,
                        output_time_frame=25, st_gcnn_dropout=0.1,
                        joints_to_consider=22, num_feature=64, num_layers=5,
                        layout="h36m", **mkw)
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(128, 35, 22, 3), jnp.float32)
        variables = model.init({"params": jrandom.key(0)}, x0[:1],
                               train=False)

        def fwd(xx, _m=model, _v=variables):
            out, _ = _m.apply(_v, xx, train=True,
                              rngs={"dropout": jrandom.key(1)},
                              mutable=["batch_stats"])
            return out

        measure(name, fwd, x0)


def run_train2(args):
    """Second wave: hybrid Pallas-spatial forward inside the REAL train
    step, with the oracle (XLA) backward instead of the hand-written Pallas
    backward (DSTDGCN_PALLAS_BWD=0) — isolates whether the r3 Pallas-train
    regression (67 ms) is the backward kernel or the forward."""
    rows = [
        ("train_bf16_gagg_flat", "1",
         dict(use_pallas=False, compute_dtype="bfloat16",
              agg_group=(5, 3), pair_flat=True)),
        ("train_bf16_gagg_flatS", "1",
         dict(use_pallas=False, compute_dtype="bfloat16",
              agg_group=(5, 3), pair_flat="spatial")),
        ("train_f32_flat", "1", dict(use_pallas=False, pair_flat=True)),
        ("train_pallasS_bf16_gt3", "0",
         dict(use_pallas="spatial", compute_dtype="bfloat16",
              agg_group=(None, 3))),
        ("train_pallas_both_oraclebwd", "0", dict(use_pallas=True)),
    ]
    for name, pbwd, kw in rows:
        os.environ["DSTDGCN_PALLAS_BWD"] = pbwd
        try:
            sec = bench._with_retry(lambda _kw=kw:
                                    bench.bench_train_step(128, **_kw))
            emit(name, round(sec * 1e3, 3), unit="ms", pallas_bwd=pbwd)
        except Exception as e:  # noqa: BLE001
            emit(name, None, error=f"{type(e).__name__}: {str(e)[:200]}")
        finally:
            os.environ.pop("DSTDGCN_PALLAS_BWD", None)


def run_train5(args):
    """Round-5 attribution of the train-mode forward overhead (VERDICT r4
    weak #2 / next #1): the r4 'structural floor' arithmetic used
    fwd_train_bf16_gagg = 6.016 ms, but that row ran agg_group (5,3) while
    the eval row (4.787) ran the tuned (5,2) — so part of the 26% gap is a
    knob mismatch, not train-mode overhead.  This wave measures, all at the
    SHIPPED tuned knobs (bf16 + (5,2)):

      fwd_eval         eval-mode forward (control)
      fwd_train        BN batch-stats + dropout mask (threefry)
      fwd_train_nodrop BN batch-stats only  -> dropout cost = train - nodrop
      fwd_train_rbg    dropout mask via the cheap rbg PRNG
      BN-stat cost = nodrop - eval

    then the full train step with each shippable fix."""
    import jax.random as jrandom

    from dstdgcn_tpu.models import DSTDGCN

    n = 128
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(n, 35, 22, 3), jnp.float32)
    mkw = dict(input_channels=6, input_time_frame=10, output_time_frame=25,
               joints_to_consider=22, num_feature=64, num_layers=5,
               layout="h36m", compute_dtype="bfloat16",
               agg_group_spatial=5, agg_group_temporal=2)

    def fwd_row(name, train, dropout=0.1, impl=None):
        model = DSTDGCN(st_gcnn_dropout=dropout, **mkw)
        variables = model.init({"params": jrandom.key(0)}, x0[:1],
                               train=False)
        key = (jrandom.key(1) if impl is None
               else jrandom.key(1, impl=impl))

        def fwd(xx, _m=model, _v=variables, _k=key, _t=train):
            if not _t:
                return _m.apply(_v, xx, train=False)
            out, _ = _m.apply(_v, xx, train=True, rngs={"dropout": _k},
                              mutable=["batch_stats"])
            return out

        measure(name, fwd, x0)

    fwd_row("fwd_eval_g52", train=False)
    fwd_row("fwd_train_g52", train=True)
    fwd_row("fwd_train_g52_nodrop", train=True, dropout=0.0)
    fwd_row("fwd_train_g52_rbg", train=True, impl="rbg")

    for name, kw in [
        ("train_g52_ctrl", dict()),                      # = r4 train_bf16_g52
        ("train_g52_rbg", dict(prng_impl="rbg")),
        ("train_g52_nodrop", dict(dropout=0.0)),         # attribution only
        ("train_g52_rbg_b32", dict(prng_impl="rbg")),    # tuned @ shipped bs
    ]:
        nb_ = 32 if name.endswith("b32") else 128
        try:
            sec = bench._with_retry(
                lambda _kw=kw, _nb=nb_: bench.bench_train_step(
                    _nb, use_pallas=False, compute_dtype="bfloat16",
                    agg_group=(5, 2), **_kw))
            emit(name, round(sec * 1e3, 3), unit="ms")
        except Exception as e:  # noqa: BLE001
            emit(name, None, error=f"{type(e).__name__}: {str(e)[:200]}")


def run_train6(args):
    """A/B the hand-derived grouped-aggregation VJP (ops/dstd.py
    _agg_*_grouped_cv, round 5): autodiff of the block-diagonal
    formulation materializes the full (g*P, g*P) cotangent then masks it
    — the custom bwd computes dadj per item instead.  Interleaved
    ON/OFF pairs at the tuned knobs (bf16, (5,2), b128) so tunnel drift
    can't masquerade as a win."""
    for name, env in [("train_cvjp_on", "1"), ("train_cvjp_off", "0"),
                      ("train_cvjp_on2", "1"), ("train_cvjp_off2", "0")]:
        os.environ["DSTDGCN_GROUPED_AGG_VJP"] = env
        try:
            sec = bench._with_retry(lambda: bench.bench_train_step(
                128, use_pallas=False, compute_dtype="bfloat16",
                agg_group=(5, 2), prng_impl="rbg"))
            emit(name, round(sec * 1e3, 3), unit="ms", cvjp=env)
        except Exception as e:  # noqa: BLE001
            emit(name, None, error=f"{type(e).__name__}: {str(e)[:200]}")
        finally:
            os.environ.pop("DSTDGCN_GROUPED_AGG_VJP", None)


def run_train7(args):
    """Round-5 follow-ups: (a) policy remat — save matmul outputs,
    recompute only the tanh-broadcast score tensor in the backward
    (finer than the full-op remat that measured slower in r4); (b)
    batch-1 serving latency of the fused whole-encoder kernel (the
    latency-bound regime was never measured at b1 — dispatch count may
    matter more than per-op efficiency there)."""
    for name, kw in [
        ("train_remat_dots", dict(compute_dtype="bfloat16",
                                  agg_group=(5, 2), remat="dots",
                                  prng_impl="rbg")),
        ("train_remat_dots_ctrl", dict(compute_dtype="bfloat16",
                                       agg_group=(5, 2),
                                       prng_impl="rbg")),
    ]:
        try:
            sec = bench._with_retry(lambda _kw=kw: bench.bench_train_step(
                128, use_pallas=False, **_kw))
            emit(name, round(sec * 1e3, 3), unit="ms")
        except Exception as e:  # noqa: BLE001
            emit(name, None, error=f"{type(e).__name__}: {str(e)[:200]}")

    try:
        rows = bench._with_retry(lambda: bench.bench_inference(n_batch=1))
        for k, v in rows.items():
            emit(f"b1_{k}", v)
    except Exception as e:  # noqa: BLE001
        emit("b1_infer", None, error=f"{type(e).__name__}: {str(e)[:200]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["chain", "chain2", "chain3", "chain4",
                                    "xattr", "train", "train2", "train3",
                                    "train5", "train6", "train7", "all"])
    args = ap.parse_args()
    emit("device", str(jax.devices()[0]))
    if args.cmd in ("chain", "all"):
        run_chain(args)
    if args.cmd == "chain2":
        run_chain2(args)
    if args.cmd == "chain3":
        run_chain3(args)
    if args.cmd == "chain4":
        run_chain4(args)
    if args.cmd == "xattr":
        run_xattr(args)
    if args.cmd in ("train", "all"):
        run_train(args)
    if args.cmd == "train2":
        run_train2(args)
    if args.cmd == "train3":
        run_train3(args)
    if args.cmd == "train5":
        run_train5(args)
    if args.cmd == "train6":
        run_train6(args)
    if args.cmd == "train7":
        run_train7(args)


if __name__ == "__main__":
    main()
