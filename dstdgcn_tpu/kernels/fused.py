"""Fused Pallas TPU kernels for the DSTD-GC contractions.

One kernel evaluates a full spatial (or temporal) DSTD-GC — feature
transform, SDDMM-style pairwise-tanh correlation, frame/joint mixing,
adjacency assembly, and SpMM aggregation — per block of samples, entirely
in VMEM.  The all-pairs score tensor and the dynamic adjacency never touch
HBM.  On the XLA path those intermediates are materialized with their
minor dims (V~22..25 joints, R=2 reduction channels) padded to 128-lane
tiles, so the op is bound by ~5-60x inflated HBM traffic (measured in
``scripts/archive/profile_components.py``); fusing removes that entirely.

Semantics are identical to :mod:`dstdgcn_tpu.ops.dstd` (golden-tested
against /root/reference/model/dstdgcn.py:53-94 via the oracle); gradients
flow through a ``custom_vjp`` whose backward is derived from the oracle,
so training with ``use_pallas=True`` is exact.

Mosaic layout strategy (every step compile-verified on a real v5e via
``scripts/archive/probe_mosaic*.py``; per-stage costs measured in
``probe_mosaic9``/``probe_mosaic11``):

  * joints (and, for the temporal op, frames) are zero-padded to sublane
    multiples so row-group reshapes are tile-aligned;
  * ALL q/k correlation projections (both stacked kernels x {q, k} x R
    reduction channels) are emitted by ONE matmul into a stacked
    ``(rows, K*2R)`` panel, which is relaid out ONCE (a single minor-dims
    transpose) into the layout the pairwise scores want — the per-(kernel,
    channel) singleton-dim transpose dance this replaces was the largest
    single cost in the kernel (~45% of device time, probe_mosaic9);
  * pairwise scores are then pure broadcasts: ``tanh(q - k)`` lands
    directly in ``(n, a, b, src)`` with the src pair-channel on lanes;
  * the frame/joint mixing factorizes over the R reduction channels into
    plain 2D matmuls ``(nb*A*B, S) @ (S, T_out)`` accumulated in f32 — no
    lane-dim concatenation (Mosaic lane merges are slow/unsupported);
  * the adjacency is re-batched for aggregation with one sublane<->lane
    transpose + one major<->sublane transpose (both Mosaic-supported);
  * the K stacked kernels fold into ONE batched aggregation matmul by
    concatenating adjacencies on lanes and features on sublanes.

Grid: one program per block of NB samples (default 4, override with
``DSTDGCN_FUSED_NB``); weights use constant index maps so Mosaic keeps
them VMEM-resident across programs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..ops import dstd as oracle

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = ["dstd_spatial", "dstd_temporal", "dstd_chain",
           "dstd_encoder_chain", "available"]


def available() -> bool:
    """True when the fused whole-op kernel path is usable.

    On TPU the kernels compile with Mosaic; on CPU the Pallas interpreter
    executes the same bodies (used by the golden tests).  Other backends
    fall back to the XLA oracle.
    """
    if not _PALLAS_OK:
        return False
    return jax.default_backend() in ("tpu", "cpu")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_samples(n: int) -> int:
    env = os.environ.get("DSTDGCN_FUSED_NB")
    prefer = int(env) if env else 4
    for nb in (prefer, 4, 2, 1):
        if 1 <= nb <= n and n % nb == 0:
            return nb
    return 1


def _vmem_limit() -> int:
    """Scoped-VMEM budget for the big fused kernels.

    The Mosaic default (16 MB) rejects these kernels' working sets (the
    single-op backward needs ~35 MB of stack at NB=4 — measured via the
    compile-time OOM on a v5e, 2026-08-19); the chip physically has 128 MB
    of VMEM, so raise the scoped limit and leave headroom for the grid
    pipeline's double buffers."""
    return int(os.environ.get("DSTDGCN_VMEM_LIMIT", str(100 * 1024 * 1024)))


def _pad_to(x, axis: int, size: int):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _row_mask(nrows: int, tp: int, vp: int, t_real: int, v_real: int):
    """(nrows, 1) float mask, 0 on zero-padded joint/frame rows of the
    flattened (n, t, v) row index."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)
    ok = rows % vp < v_real
    if t_real < tp:
        ok = jnp.logical_and(ok, (rows // vp) % tp < t_real)
    return jnp.where(ok, 1.0, 0.0).astype(jnp.float32)


def _dot_fn(dtype):
    """MXU matmul helper: optionally cast INPUTS to ``dtype`` (bf16) while
    accumulating in f32 — the v5e MXU runs bf16 inputs at ~4x the f32
    issue rate, and every matmul in these kernels has small K/N dims, so
    the cast overhead is tiny relative to the rate win."""

    def dot(a, b, dims=None):
        if dtype is not None:
            a, b = a.astype(dtype), b.astype(dtype)
        if dims is None:
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32)

    return dot


def _spatial_kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wqk_ref,
                    bqk_ref, wrm_ref, brm_ref, out_ref,
                    *, num_kernels: int, red: int, agg: str, v_real: int,
                    dtype=None):
    """Spatial DSTD-GC: per-frame joint graph (reference dstdgcn.py:75-87).

    x (nb, T, Vp, Ci) -> out (nb, T, Vp, Co).  Host-prepared weights:
    wqk (Ci, K*2R) stacked [q_k0 | k_k0 | q_k1 | ...] panels; wrm
    (K, R, Ts, To); base (K, Vp_a, Vp_b, 1) already transposed so that the
    kernel's (a, b) adjacency layout has b = the aggregation's contracted
    side; brm (K, 1, 1, To).
    """
    nb, t, vp, cin = x_ref.shape
    co = out_ref.shape[-1]
    dot = _dot_fn(dtype)
    x2 = x_ref[:].reshape(nb * t * vp, cin)
    alpha = alpha_ref[0, 0]
    jmask = _row_mask(nb * t * vp, t, vp, t, v_real)

    # one stacked correlation projection + ONE relayout to frames-on-lanes
    qk = dot(x2, wqk_ref[:]) + bqk_ref[0]
    qk4 = qk.reshape(nb, t, vp, num_kernels * 2 * red)
    qk_t = jnp.swapaxes(jnp.swapaxes(qk4, 1, 2), 2, 3)   # (nb, vp, K2R, t)

    xfs, adjs = [], []
    for k in range(num_kernels):
        xf = dot(x2, wf_ref[k]) + bf_ref[k]
        xfs.append((xf * jmask).reshape(nb * t, vp, co))
        dyn = None
        for ri in range(red):
            qs = qk_t[:, :, k * 2 * red + ri, :]         # (nb, vp, t)
            ks = qk_t[:, :, k * 2 * red + red + ri, :]
            # scores in (n, a, b, src-frame) layout, b = contracted side:
            # agg "right" contracts the q-side joints (a=w, b=v), "left"
            # the k-side (a=v, b=w) — dstdgcn.py:87 / dstdgcn_fast.py:125
            if agg == "right":
                s = jnp.tanh(qs[:, None, :, :] - ks[:, :, None, :])
            else:
                s = jnp.tanh(qs[:, :, None, :] - ks[:, None, :, :])
            # mixing factorized over R: (nb*A*B, Ts) @ (Ts, To), f32 accum
            d = dot(s.reshape(nb * vp * vp, t), wrm_ref[k, ri])
            dyn = d if dyn is None else dyn + d
        adj = dyn.reshape(nb, vp, vp, t)
        adj = (adj + brm_ref[k]) * alpha + base_ref[k][None]
        # re-batch over (n, frame) for the per-frame aggregation
        adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)  # (nb, To, a, b)
        adjs.append(adj.reshape(nb * t, vp, vp))
    # fold the K stacked kernels into one batched matmul: adjacencies on
    # lanes, features on sublanes
    adj_cat = adjs[0] if num_kernels == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if num_kernels == 1 else jnp.concatenate(xfs, axis=1)
    out = dot(adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))))  # (nb*T,Vp,Co)
    out = out.reshape(nb * t * vp, co) * jmask
    out_ref[:] = out.reshape(nb, t, vp, co)


def _temporal_kernel(x_ref, base_ref, alpha_ref, wf_ref, bf_ref, wqk_ref,
                     bqk_ref, wrm_ref, brm_ref, out_ref,
                     *, num_kernels: int, red: int, agg: str, v_real: int,
                     t_real: int, dtype=None):
    """Temporal DSTD-GC: per-joint frame graph (reference dstdgcn.py:89-93).

    x (nb, Tp, Vp, Ci) -> out (nb, Tp, Vp, Co), frames AND joints padded.
    Host-prepared weights: wqk (Ci, K*2R); wrm (K, R, Vp, Wp) with zero
    rows/cols for padded joints; base (K, Tp, Tp, 1); brm (K, 1, 1, Wp).
    """
    nb, tp, vp, cin = x_ref.shape
    co = out_ref.shape[-1]
    dot = _dot_fn(dtype)
    x2 = x_ref[:].reshape(nb * tp * vp, cin)
    alpha = alpha_ref[0, 0]
    mask = _row_mask(nb * tp * vp, tp, vp, t_real, v_real)

    # stacked projection; scores want joints-on-lanes, which is ONE
    # minor-dims transpose of the panel (then every slice is layout-free)
    qk = dot(x2, wqk_ref[:]) + bqk_ref[0]
    qk3 = qk.reshape(nb * tp, vp, num_kernels * 2 * red)
    qk_t = jnp.swapaxes(qk3, 1, 2)                       # (nb*Tp, K2R, vp)

    xfs, adjs = [], []
    for k in range(num_kernels):
        xf = dot(x2, wf_ref[k]) + bf_ref[k]
        xf = xf * mask
        # features batched over (n, joint) for the per-joint aggregation
        xf_v = jnp.swapaxes(xf.reshape(nb, tp, vp, co), 1, 2) \
            .reshape(nb * vp, tp, co)
        xfs.append(xf_v)
        dyn = None
        for ri in range(red):
            qs = qk_t[:, k * 2 * red + ri, :].reshape(nb, tp, vp)
            ks = qk_t[:, k * 2 * red + red + ri, :].reshape(nb, tp, vp)
            # frame-pair scores in (n, t_q, u_k, joint) layout: the score
            # joints are on lanes so the joint mixing is a flat matmul
            s = jnp.tanh(qs[:, :, None, :] - ks[:, None, :, :])
            # padded score joints are killed by the zero wrm rows
            d = dot(s.reshape(nb * tp * tp, vp), wrm_ref[k, ri])
            dyn = d if dyn is None else dyn + d
        adj = dyn.reshape(nb, tp, tp, vp)
        adj = (adj + brm_ref[k]) * alpha + base_ref[k][None]
        # re-batch over (n, joint): (nb, t, u, w) -> (nb, w, t, u)
        adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)
        adj_v = adj.reshape(nb * vp, tp, tp)
        if agg == "right":
            # out[u, c] = sum_t adj[t, u] xf[t, c]  (dstdgcn.py:93)
            adj_v = jnp.swapaxes(adj_v, 1, 2)
        adjs.append(adj_v)
    adj_cat = adjs[0] if num_kernels == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if num_kernels == 1 else jnp.concatenate(xfs, axis=1)
    out_v = dot(adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))))  # (nbV,Tp,Co)
    out = jnp.swapaxes(out_v.reshape(nb, vp, tp, co), 1, 2)
    out = out.reshape(nb * tp * vp, co) * mask
    out_ref[:] = out.reshape(nb, tp, vp, co)


def _stack_qk(wm1, bm1, wm2, bm2):
    """(K, Ci, R) q/k projection weights -> one (Ci, K*2R) panel with
    column order [q_k0(R) | k_k0(R) | q_k1(R) | ...]."""
    k = wm1.shape[0]
    cols = []
    bcols = []
    for ki in range(k):
        cols += [wm1[ki], wm2[ki]]
        bcols += [bm1[ki], bm2[ki]]
    return jnp.concatenate(cols, axis=1), \
        jnp.concatenate(bcols, axis=0)[None, :]


def _prep_spatial(base, wrm, brm, vp, tp, agg):
    base_p = _pad_to(_pad_to(base, 1, vp), 2, vp)
    if agg == "right":
        base_p = jnp.swapaxes(base_p, 1, 2)   # (a=w, b=v) kernel layout
    return base_p[..., None], wrm, brm[:, None, None, :]


def _prep_temporal(base, wrm, brm, vp, tp, agg):
    wrm_p = _pad_to(_pad_to(wrm, 2, vp), 3, vp)
    base_p = _pad_to(_pad_to(base, 1, tp), 2, tp)[..., None]
    brm_p = _pad_to(brm, 1, vp)[:, None, None, :]
    return base_p, wrm_p, brm_p


def _pallas_forward(kernel_body, prep, pad_t, x, base, alpha, wf, bf, wm1,
                    bm1, wm2, bm2, wrm, brm, agg: str, dtype=None):
    n, t, v, cin = x.shape
    k = wf.shape[0]
    co = wf.shape[-1]
    red = wm1.shape[-1]
    vp = -(-v // 8) * 8
    tp = -(-t // 8) * 8 if pad_t else t
    nb = _block_samples(n)
    x_p = _pad_to(_pad_to(x.astype(jnp.float32), 2, vp), 1, tp)
    base_p, wrm_p, brm_p = prep(base, wrm, brm, vp, tp, agg)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    bf2 = bf[:, None, :]
    wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)

    extra = dict(t_real=t) if pad_t else {}

    def vmem_full(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(kernel_body, num_kernels=k, red=red, agg=agg,
                          v_real=v, dtype=dtype, **extra),
        out_shape=jax.ShapeDtypeStruct((n, tp, vp, co), jnp.float32),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, tp, vp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem_full(base_p), vmem_full(alpha_arr), vmem_full(wf),
            vmem_full(bf2), vmem_full(wqk), vmem_full(bqk),
            vmem_full(wrm_p), vmem_full(brm_p),
        ],
        out_specs=pl.BlockSpec((nb, tp, vp, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(x_p, base_p, alpha_arr, wf, bf2, wqk, bqk, wrm_p, brm_p)
    return out[:, :t, :v, :]


def _make_op(kernel_body, prep, pad_t, oracle_fn, pallas_bwd_name):

    @functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
    def op(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
           mask=None, agg="right", dtype=None):
        if mask is not None or not available():
            return oracle_fn(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2,
                             wrm, brm, mask, agg, dtype)
        out = _pallas_forward(kernel_body, prep, pad_t, x, base, alpha,
                              wf, bf, wm1, bm1, wm2, bm2, wrm, brm, agg,
                              dtype)
        # mixed-precision activation flow parity with the oracle
        # (ops/dstd.py dstd_spatial tail): emit the compute dtype
        return out if dtype is None else out.astype(dtype)

    def fwd(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm, mask, agg,
            dtype):
        out = op(x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
                 mask, agg, dtype)
        return out, (x, base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm)

    def bwd(mask, agg, dtype, res, g):
        use_pallas_bwd = (mask is None and available() and
                          os.environ.get("DSTDGCN_PALLAS_BWD", "1") == "1")
        if use_pallas_bwd:
            # hand-derived whole-op backward kernel: dx + every weight
            # grad in one VMEM pass (kernels/fused_bwd.py); cotangent
            # dtypes must match the primals (a bf16 activation flow would
            # otherwise inject f32 cotangents into upstream transposes)
            from . import fused_bwd
            grads = getattr(fused_bwd, pallas_bwd_name)(res, g, agg, dtype)
            return tuple(gr.astype(jnp.asarray(r).dtype)
                         for gr, r in zip(grads, res))
        # exact gradients via the oracle formulation (XLA backward)
        def f(*args):
            return oracle_fn(*args, mask, agg, dtype)
        _, vjp = jax.vjp(f, *res)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


dstd_spatial = _make_op(_spatial_kernel, _prep_spatial, False,
                        oracle.dstd_spatial, "spatial_bwd")
dstd_temporal = _make_op(_temporal_kernel, _prep_temporal, True,
                         oracle.dstd_temporal, "temporal_bwd")


# ---------------------------------------------------------------- chain --
#
# Whole-chain kernel: B alternating (spatial, temporal) DSTD-GC ops in ONE
# pallas_call.  Stage ablation on a v5e (scripts/archive/probe_mosaic9/11/13) shows
# the per-op fused kernels are dominated by their grid pipeline — pad, DMA
# in, DMA out, slice — not by compute (the temporal op's identity-copy
# floor is ~86% of its total).  Fusing the chain pays that pipeline ONCE:
# activations stay in VMEM across all ops.  Frames and joints are padded
# throughout; each op's row mask keeps padded rows zero, and zero-padded
# wrm rows/cols kill padded source frames/joints in the mixing (same
# construction the per-op kernels use, golden-tested vs the oracle chain).
#
# Round-4 attribution (scripts/probe.py chain/chain2/chain3, flagship
# shape N=128 T=35 V=22 C=64 B=7, nb=4, f32): total 5.65 ms =
#   0.47 grid/DMA pipeline floor (copy-only kernel)
#   1.85 feature projections ((3840,64)@(64,64) x3/block — 64-lane
#        underfill; ~9.4 TF/s achieved)
#   0.08 q/k projections
#   2.22 pairwise scores + frame/joint mixing + adjacency relayouts
#        (0.42 of it tanh; the rest VPU broadcasts + two lane<->sublane
#        transposes per op)
#   0.61 aggregation (batched (24,48)@(48,64) tiny-GEMMs)
# plus ~0.4 unattributed overlap loss.  Every structural fix tried either
# does not help or is rejected by the current Mosaic toolchain:
#   * no-T-padding (35 instead of 40): 9.04 ms — 35-lane transposes hit
#     slow paths; keep every dim a sublane multiple;
#   * larger sample blocks nb=8/16: 6.6/6.1 ms (VMEM pressure beats the
#     program-overhead amortization); nb=1/2 measured in probe chain3;
#   * merged (C, K*C) feature panel (one full-128-lane matmul + lane
#     slices or a 4D swap): deterministic tpu_compile_helper crash;
#   * in-kernel block-diagonal grouped aggregation (the XLA-path winner):
#     deterministic compiler crash (5-D eye-broadcast formulation);
#   * direct dot_general aggregation with in-place batch dims (kills all
#     adjacency re-batch transposes): 'tpu.matmul' Not implemented;
#   * bf16 dot inputs anywhere (whole kernel +1.1 ms, projections-only
#     +0.04 ms): the f32->bf16 (8,128)->(16,128) relayout per operand
#     exceeds the MXU rate win at these tiny matmul shapes — the same
#     result as round 3, now isolated to the cast itself;
#   * "parallel" dimension semantics on the sample axis: no change.
# Conclusion: the chain kernel is within ~8%% of XLA's fused pipeline on
# this shape and toolchain-walled there; the XLA formulation (bf16 +
# grouped aggregation) remains the shipped default, and the chain kernel
# remains the VMEM-residency option for memory-pressured serving.
#
# Mosaic structure (round 3): the block loop lives in the GRID, not in the
# kernel body.  grid = (N/nb, B) with the block index b as the minor
# (fastest) dimension; per-block weights are streamed by BlockSpec index
# maps (i, b) -> (b, ...), and the running activation lives in the OUTPUT
# VMEM buffer, whose index map is constant in b — Mosaic keeps a
# revisited output block resident and writes HBM once per sample block.
# Each program is therefore one small (spatial, temporal) body.  The
# previous design — all B blocks unrolled inside one kernel with every
# block's weights VMEM-resident — produced a program that deterministically
# crashes the Mosaic compile helper (tpu_compile_helper exit 1, reproduced
# across retries on 2026-08-19); a fori_loop over dynamically-indexed VMEM
# weights is likewise a hard crash (scripts/archive/probe_mosaic14).


def _spatial_body(x2, b, nb, tp, vp, cin, jmask, ks, red, agg,
                  base_ref, alpha_ref, wf_ref, bf_ref, wqk_ref, bqk_ref,
                  wrm_ref, brm_ref, dtype=None):
    co = wf_ref.shape[-1]
    dot = _dot_fn(dtype)
    alpha = alpha_ref[b, 0, 0]
    qk = dot(x2, wqk_ref[b]) + bqk_ref[b]
    qk4 = qk.reshape(nb, tp, vp, ks * 2 * red)
    qk_t = jnp.swapaxes(jnp.swapaxes(qk4, 1, 2), 2, 3)   # (nb, vp, K2R, tp)
    xfs, adjs = [], []
    for k in range(ks):
        xf = dot(x2, wf_ref[b, k]) + bf_ref[b, k]
        xfs.append((xf * jmask).reshape(nb * tp, vp, co))
        dyn = None
        for ri in range(red):
            qs = qk_t[:, :, k * 2 * red + ri, :]
            kk = qk_t[:, :, k * 2 * red + red + ri, :]
            if agg == "right":
                s = jnp.tanh(qs[:, None, :, :] - kk[:, :, None, :])
            else:
                s = jnp.tanh(qs[:, :, None, :] - kk[:, None, :, :])
            d = dot(s.reshape(nb * vp * vp, tp), wrm_ref[b, k, ri])
            dyn = d if dyn is None else dyn + d
        adj = dyn.reshape(nb, vp, vp, tp)
        adj = (adj + brm_ref[b, k]) * alpha + base_ref[b, k][None]
        adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)
        adjs.append(adj.reshape(nb * tp, vp, vp))
    adj_cat = adjs[0] if ks == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if ks == 1 else jnp.concatenate(xfs, axis=1)
    out = dot(adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))))
    return out.reshape(nb * tp * vp, co) * jmask


def _temporal_body(x2, b, nb, tp, vp, cin, jmask, kt, red, agg,
                   base_ref, alpha_ref, wf_ref, bf_ref, wqk_ref, bqk_ref,
                   wrm_ref, brm_ref, dtype=None):
    co = wf_ref.shape[-1]
    dot = _dot_fn(dtype)
    alpha = alpha_ref[b, 0, 0]
    qk = dot(x2, wqk_ref[b]) + bqk_ref[b]
    qk3 = qk.reshape(nb * tp, vp, kt * 2 * red)
    qk_t = jnp.swapaxes(qk3, 1, 2)                       # (nb*Tp, K2R, vp)
    xfs, adjs = [], []
    for k in range(kt):
        xf = dot(x2, wf_ref[b, k]) + bf_ref[b, k]
        xf = xf * jmask
        xf_v = jnp.swapaxes(xf.reshape(nb, tp, vp, co), 1, 2) \
            .reshape(nb * vp, tp, co)
        xfs.append(xf_v)
        dyn = None
        for ri in range(red):
            qs = qk_t[:, k * 2 * red + ri, :].reshape(nb, tp, vp)
            kk = qk_t[:, k * 2 * red + red + ri, :].reshape(nb, tp, vp)
            s = jnp.tanh(qs[:, :, None, :] - kk[:, None, :, :])
            d = dot(s.reshape(nb * tp * tp, vp), wrm_ref[b, k, ri])
            dyn = d if dyn is None else dyn + d
        adj = dyn.reshape(nb, tp, tp, vp)
        adj = (adj + brm_ref[b, k]) * alpha + base_ref[b, k][None]
        adj = jnp.swapaxes(jnp.swapaxes(adj, 2, 3), 1, 2)
        adj_v = adj.reshape(nb * vp, tp, tp)
        if agg == "right":
            adj_v = jnp.swapaxes(adj_v, 1, 2)
        adjs.append(adj_v)
    adj_cat = adjs[0] if kt == 1 else jnp.concatenate(adjs, axis=2)
    xf_cat = xfs[0] if kt == 1 else jnp.concatenate(xfs, axis=1)
    out_v = dot(adj_cat, xf_cat, (((2,), (1,)), ((0,), (0,))))
    out = jnp.swapaxes(out_v.reshape(nb, vp, tp, co), 1, 2)
    return out.reshape(nb * tp * vp, co) * jmask


def _chain_grid_kernel(x_ref, sb_ref, sa_ref, swf_ref, sbf_ref, swqk_ref,
                       sbqk_ref, swrm_ref, sbrm_ref, tb_ref, ta_ref, twf_ref,
                       tbf_ref, twqk_ref, tbqk_ref, twrm_ref, tbrm_ref,
                       out_ref, *, ks, kt, red, agg, v_real, t_real,
                       dtype=None):
    """One (spatial, temporal) DSTD-GC block of the chain.

    Grid = (samples/nb, blocks) with the block index minor; every weight
    ref is the current block's slice (leading dim 1, streamed by the
    BlockSpec index maps).  The running activation lives in ``out_ref``,
    whose index map is constant in the block dimension, so Mosaic keeps it
    VMEM-resident across the whole chain and writes HBM once per sample
    block.
    """
    nb, tp, vp, cin = x_ref.shape
    jmask = _row_mask(nb * tp * vp, tp, vp, t_real, v_real)

    @pl.when(pl.program_id(1) == 0)
    def _seed():
        out_ref[:] = x_ref[:]          # host-padded rows are already zero

    x2 = out_ref[:].reshape(nb * tp * vp, cin)
    y2 = _spatial_body(x2, 0, nb, tp, vp, cin, jmask, ks, red, agg,
                       sb_ref, sa_ref, swf_ref, sbf_ref, swqk_ref,
                       sbqk_ref, swrm_ref, sbrm_ref, dtype)
    z2 = _temporal_body(y2, 0, nb, tp, vp, cin, jmask, kt, red, agg,
                        tb_ref, ta_ref, twf_ref, tbf_ref, twqk_ref,
                        tbqk_ref, twrm_ref, tbrm_ref, dtype)
    out_ref[:] = z2.reshape(nb, tp, vp, cin)


def _chain_pallas(x, blocks_params, agg, dtype=None, nb=None):
    n, t, v, cin = x.shape
    vp, tp = -(-v // 8) * 8, -(-t // 8) * 8
    if nb is None or n % nb != 0:
        nb = _block_samples(n)
    sp0, tp0 = blocks_params[0]
    ks, kt, red = sp0[2].shape[0], tp0[2].shape[0], sp0[4].shape[-1]

    def stack(prep):
        return [jnp.stack(a) for a in zip(*[prep(s, tt)
                                            for s, tt in blocks_params])]

    def prep_s(s, _):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        base_p = _pad_to(_pad_to(base, 1, vp), 2, vp)
        if agg == "right":
            base_p = jnp.swapaxes(base_p, 1, 2)
        wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)
        # pad source/output frames with zero wrm rows/cols: padded frames
        # contribute nothing and get base-only adjacencies over zero xf
        wrm_p = _pad_to(_pad_to(wrm, 2, tp), 3, tp)
        brm_p = _pad_to(brm, 1, tp)[:, None, None, :]
        return (base_p[..., None], jnp.asarray(alpha, jnp.float32)
                .reshape(1, 1), wf, bf[:, None, :], wqk, bqk, wrm_p, brm_p)

    def prep_t(_, s):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = _pad_to(_pad_to(wrm, 2, vp), 3, vp)
        base_p = _pad_to(_pad_to(base, 1, tp), 2, tp)[..., None]
        brm_p = _pad_to(brm, 1, vp)[:, None, None, :]
        return (base_p, jnp.asarray(alpha, jnp.float32).reshape(1, 1),
                wf, bf[:, None, :], wqk, bqk, wrm_p, brm_p)

    s_args = stack(lambda s, tt: prep_s(s, tt))
    t_args = stack(lambda s, tt: prep_t(s, tt))
    x_p = _pad_to(_pad_to(x.astype(jnp.float32), 2, vp), 1, tp)

    def per_block(a):
        """Stream one block's slice of a (B, ...)-stacked weight array."""
        nd = a.ndim
        return pl.BlockSpec((1,) + a.shape[1:],
                            lambda i, b, _n=nd: (b,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_chain_grid_kernel, ks=ks, kt=kt, red=red,
                          agg=agg, v_real=v, t_real=t, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((n, tp, vp, cin), jnp.float32),
        grid=(n // nb, len(blocks_params)),
        in_specs=[pl.BlockSpec((nb, tp, vp, cin),
                               lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [per_block(a) for a in s_args + t_args],
        out_specs=pl.BlockSpec((nb, tp, vp, cin), lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        # b revisits the output block (the running activation): the grid
        # must execute sequentially along both dims
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(x_p, *s_args, *t_args)
    return out[:, :t, :v, :]


def _chain_oracle(x, blocks_params, agg):
    for s_args, t_args in blocks_params:
        x = oracle.dstd_spatial(x, *s_args, agg=agg)
        x = oracle.dstd_temporal(x, *t_args, agg=agg)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dstd_chain(x, blocks_params, agg="right", dtype=None, nb=None):
    """B-block (spatial, temporal) DSTD-GC chain as ONE fused kernel.

    ``blocks_params``: list of ``(spatial_args, temporal_args)`` tuples,
    each a 10-tuple ``(base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm)``
    (the :func:`dstd_spatial` / :func:`dstd_temporal` argument order).
    Requires constant channel width across the chain.  Matches running the
    per-op chain (reference model/dstdgcn.py:145-161 applied B times);
    gradients replay the oracle chain.

    ``dtype`` (e.g. ``jnp.bfloat16``) casts every MXU matmul's INPUTS
    inside the kernel while accumulating f32; ``nb`` overrides the samples
    per grid program (VMEM residency vs pipeline-depth trade-off).
    """
    if not available():
        return _chain_oracle(x, blocks_params, agg)
    return _chain_pallas(x, blocks_params, agg, dtype, nb)


def _chain_fwd(x, blocks_params, agg, dtype, nb):
    return dstd_chain(x, blocks_params, agg, dtype, nb), (x, blocks_params)


def _chain_bwd(agg, dtype, nb, res, g):
    x, blocks_params = res
    _, vjp = jax.vjp(lambda xx, ps: _chain_oracle(xx, ps, agg), x,
                     blocks_params)
    return vjp(g)


dstd_chain.defvjp(_chain_fwd, _chain_bwd)


# -------------------------------------------------------- encoder chain --
#
# Whole-ENCODER fused inference kernel: L residual encoder layers of the
# flagship DSTDGCN (reference model/dstdgcn.py:310-311, each layer =
# ST_GCNN_layer(refine, residual) + BatchNorm + PReLU) in ONE pallas_call.
# In eval mode every JointBatchNorm collapses to a per-(joint, channel)
# affine, so the full layer body
#
#   y = prelu1(bn1(spatial(x)) + x); z = prelu2(bn2(temporal(y) + x))
#
# (DSTDGCB dstdgcn.py:141-161 with cin == co, plus the ST_GCNN layer
# residual dstdgcn.py:246-247 and the model-level BN/PReLU) runs entirely
# in VMEM: activations touch HBM once per sample block for the whole
# encoder instead of ~6 times per layer.  Grid/streaming structure is the
# same as dstd_chain.  Inference-only by construction (running-stats BN,
# no dropout inside the encoder); gradients are not defined.


def _encoder_grid_kernel(x_ref, sb_ref, sa_ref, swf_ref, sbf_ref, swqk_ref,
                         sbqk_ref, swrm_ref, sbrm_ref, tb_ref, ta_ref,
                         twf_ref, tbf_ref, twqk_ref, tbqk_ref, twrm_ref,
                         tbrm_ref, sc1_ref, sh1_ref, sc2_ref, sh2_ref,
                         pa1_ref, pa2_ref, out_ref,
                         *, ks, kt, red, agg, v_real, t_real, dtype=None):
    """One encoder layer of the fused-inference chain.

    ``sc1/sh1`` and ``sc2/sh2``: (1, Vp, C) eval-BN affine scale/shift for
    the block BN and the model-level BN; ``pa1/pa2``: (1, 1, 1) PReLU
    negative slopes (split into per-tensor refs — Mosaic rejects a packed
    (1, 2) block).  Padded-joint rows of the affines are zero so padded
    rows stay zero; a final row mask kills the shift leak into padded
    frames.
    """
    nb, tp, vp, cin = x_ref.shape
    jmask = _row_mask(nb * tp * vp, tp, vp, t_real, v_real)

    @pl.when(pl.program_id(1) == 0)
    def _seed():
        out_ref[:] = x_ref[:]

    def prelu(v2, a):
        return jnp.where(v2 >= 0, v2, a * v2)

    def affine(v2, sc, sh):
        v4 = v2.reshape(nb, tp, vp, cin)
        v4 = v4 * sc[0][None, None] + sh[0][None, None]
        return v4.reshape(nb * tp * vp, cin)

    x2 = out_ref[:].reshape(nb * tp * vp, cin)
    y2 = _spatial_body(x2, 0, nb, tp, vp, cin, jmask, ks, red, agg,
                       sb_ref, sa_ref, swf_ref, sbf_ref, swqk_ref,
                       sbqk_ref, swrm_ref, sbrm_ref, dtype)
    y2 = prelu(affine(y2, sc1_ref, sh1_ref) * jmask + x2, pa1_ref[0, 0, 0])
    z2 = _temporal_body(y2, 0, nb, tp, vp, cin, jmask, kt, red, agg,
                        tb_ref, ta_ref, twf_ref, tbf_ref, twqk_ref,
                        tbqk_ref, twrm_ref, tbrm_ref, dtype)
    z2 = prelu(affine(z2 + x2, sc2_ref, sh2_ref) * jmask, pa2_ref[0, 0, 0])
    out_ref[:] = z2.reshape(nb, tp, vp, cin)


def bn_affine(scale, bias, mean, var, eps: float = 1e-5):
    """Fold eval-mode JointBatchNorm params ((V, C) each, models/layers.py
    JointBatchNorm with running stats) into a (2, V, C) multiply-add."""
    inv = scale * jax.lax.rsqrt(var + eps)
    return jnp.stack([inv, bias - mean * inv])


def _encoder_oracle(x, layers_params, agg):
    for sp, tm, aff1, aff2, pa in layers_params:
        y = oracle.dstd_spatial(x, *sp, agg=agg)
        y = y * aff1[0][None, None] + aff1[1][None, None] + x
        y = jnp.where(y >= 0, y, pa[0] * y)
        z = oracle.dstd_temporal(y, *tm, agg=agg) + x
        z = z * aff2[0][None, None] + aff2[1][None, None]
        x = jnp.where(z >= 0, z, pa[1] * z)
    return x


def dstd_encoder_chain(x, layers_params, agg="right", dtype=None, nb=None):
    """L-layer fused-inference encoder chain (reference dstdgcn.py:310-311).

    ``layers_params``: list of ``(spatial_args, temporal_args, aff1, aff2,
    prelu_a)`` per encoder layer — the 10-tuples of :func:`dstd_spatial` /
    :func:`dstd_temporal`, the two folded eval-BN affines ((2, V, C), see
    :func:`bn_affine`; aff1 = the in-block BN, aff2 = the model-level BN),
    and the two PReLU negative slopes ``(2,)``.  Channel width must be
    constant (the flagship encoder: C=64).  Eval-mode semantics only —
    matches the per-op model path in train=False (golden-tested); no VJP.
    """
    if not available():
        return _encoder_oracle(x, layers_params, agg)
    n, t, v, cin = x.shape
    vp, tp = -(-v // 8) * 8, -(-t // 8) * 8
    if nb is None or n % nb != 0:
        nb = _block_samples(n)
    sp0, tp0 = layers_params[0][0], layers_params[0][1]
    ks, kt, red = sp0[2].shape[0], tp0[2].shape[0], sp0[4].shape[-1]

    def prep_s(s):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        base_p = _pad_to(_pad_to(base, 1, vp), 2, vp)
        if agg == "right":
            base_p = jnp.swapaxes(base_p, 1, 2)
        wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = _pad_to(_pad_to(wrm, 2, tp), 3, tp)
        brm_p = _pad_to(brm, 1, tp)[:, None, None, :]
        return (base_p[..., None], jnp.asarray(alpha, jnp.float32)
                .reshape(1, 1), wf, bf[:, None, :], wqk, bqk, wrm_p, brm_p)

    def prep_t(s):
        base, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm = s
        wqk, bqk = _stack_qk(wm1, bm1, wm2, bm2)
        wrm_p = _pad_to(_pad_to(wrm, 2, vp), 3, vp)
        base_p = _pad_to(_pad_to(base, 1, tp), 2, tp)[..., None]
        brm_p = _pad_to(brm, 1, vp)[:, None, None, :]
        return (base_p, jnp.asarray(alpha, jnp.float32).reshape(1, 1),
                wf, bf[:, None, :], wqk, bqk, wrm_p, brm_p)

    s_args = [jnp.stack(a) for a in
              zip(*[prep_s(lp[0]) for lp in layers_params])]
    t_args = [jnp.stack(a) for a in
              zip(*[prep_t(lp[1]) for lp in layers_params])]
    # padded-joint affine rows are zero -> padded rows never acquire shift
    sc1 = jnp.stack([_pad_to(lp[2][0], 0, vp) for lp in layers_params])
    sh1 = jnp.stack([_pad_to(lp[2][1], 0, vp) for lp in layers_params])
    sc2 = jnp.stack([_pad_to(lp[3][0], 0, vp) for lp in layers_params])
    sh2 = jnp.stack([_pad_to(lp[3][1], 0, vp) for lp in layers_params])
    pa1 = jnp.stack([jnp.asarray(lp[4][0], jnp.float32).reshape(1, 1)
                     for lp in layers_params])
    pa2 = jnp.stack([jnp.asarray(lp[4][1], jnp.float32).reshape(1, 1)
                     for lp in layers_params])
    x_p = _pad_to(_pad_to(x.astype(jnp.float32), 2, vp), 1, tp)

    def per_layer(a):
        nd = a.ndim
        return pl.BlockSpec((1,) + a.shape[1:],
                            lambda i, b, _n=nd: (b,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_encoder_grid_kernel, ks=ks, kt=kt, red=red,
                          agg=agg, v_real=v, t_real=t, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((n, tp, vp, cin), jnp.float32),
        grid=(n // nb, len(layers_params)),
        in_specs=[pl.BlockSpec((nb, tp, vp, cin),
                               lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [per_layer(a) for a in s_args + t_args
           + [sc1, sh1, sc2, sh2, pa1, pa2]],
        out_specs=pl.BlockSpec((nb, tp, vp, cin), lambda i, b: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(x_p, *s_args, *t_args, sc1, sh1, sc2, sh2, pa1, pa2)
    return out[:, :t, :v, :]
