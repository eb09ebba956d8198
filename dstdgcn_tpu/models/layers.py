"""Flax building blocks for the DSTD-GCN family.

Channels-last ``(N, T, V, C)`` modules whose math matches the reference
PyTorch layers (``/root/reference/model/dstdgcn.py``) while being idiomatic
JAX: parameters are pytrees, the per-kernel Python loops of the reference
become stacked kernel axes, and everything composes under ``jit``/``pjit``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graphs import skeleton as sk
from ..graphs import temporal as tg
from ..ops import dstd as ops

Array = jax.Array


def kaiming_out(fan_out: int) -> Callable:
    """Kaiming-normal (mode=fan_out, gain=sqrt(2)) matching torch
    ``nn.init.kaiming_normal_(w, mode='fan_out')`` for a 1x1 conv
    (reference dstdgcn.py:14-17).  ``fan_out`` is passed explicitly because
    our kernels carry a leading stacked-kernel axis."""
    std = float(np.sqrt(2.0 / fan_out))

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def uniform_pm(bound: float) -> Callable:
    """U(-bound, bound) init (torch ``.uniform_(-stdv, stdv)``)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def constant_init(value: np.ndarray) -> Callable:
    arr = jnp.asarray(value)

    def init(key, shape, dtype=jnp.float32):
        assert tuple(shape) == arr.shape, (shape, arr.shape)
        return arr.astype(dtype)

    return init


class JointBatchNorm(nn.Module):
    """BatchNorm over (channel, joint) pairs across batch x time.

    Equivalent to the reference ``BatchNorm`` wrapper around
    ``nn.BatchNorm1d(C*V)`` on ``(N, C*V, T)`` (dstdgcn.py:35-50): every
    (c, v) feature is normalized over the N*T samples, with torch
    momentum/eps defaults and running statistics.

    TPU-first details: operates directly on channels-last (N, T, V, C)
    without the permute/reshape dance, and supports cross-replica statistics
    via ``axis_name`` (``psum`` over the data mesh axis) so distributed
    training reproduces single-device dynamics at the same global batch.
    """

    momentum: float = 0.1  # torch: new = (1 - m) * old + m * batch
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        v, c = x.shape[-2], x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (v, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (v, c), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((v, c), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((v, c), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            cnt = x.shape[0] * x.shape[1]
            mean = jnp.mean(xf, axis=(0, 1))
            mean_sq = jnp.mean(xf * xf, axis=(0, 1))
            if self.axis_name is not None:
                # cross-replica ("sync BN") statistics over the data axis
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                cnt = cnt * jax.lax.psum(1, self.axis_name)
            var = mean_sq - mean * mean  # biased, used for normalization
            if not self.is_initializing():
                unbiased = var * (cnt / max(cnt - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x - mean) * inv + bias).astype(self.dtype)


class PReLU(nn.Module):
    """Single-parameter PReLU, torch default init 0.25 (dstdgcn.py:132)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: Array) -> Array:
        a = self.param("negative_slope",
                       lambda key: jnp.asarray(self.init, jnp.float32))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class DSTDGC(nn.Module):
    """Stacked Dynamic SpatioTemporal Decompose Graph Convolution.

    One module evaluates K reference ``DSTDGC`` units (dstdgcn.py:53-94) in
    a single batched contraction; the caller supplies the K static base
    adjacencies and the shared dynamic gate ``alpha``.
    """

    out_channels: int
    ref_len: int            # T for spatial mode, V for temporal mode
    num_kernels: int = 1
    red_channels: int = 2
    mode: str = "spatial"
    agg: str = "right"      # "right"=qualitative, "left"=fast variant
    #: False | True | 'spatial' | 'temporal' | 'serving'.  'serving' routes
    #: the fused kernels only when NOT training: Pallas-in-training is a
    #: measured structural regression on v5e (the custom_vjp forward pays
    #: the per-op grid pipeline AND the backward replays the oracle —
    #: probe r4: 67-88 ms vs 40 ms XLA at batch 128)
    use_pallas: Union[bool, str] = False
    compute_dtype: Optional[str] = None   # e.g. "bfloat16" (f32 accum)
    #: flat (P*P)-lane score layout (ops.dstd): True/False for both ops or
    #: 'spatial'/'temporal' for one side ('spatial' is the measured v5e win)
    pair_flat: Union[bool, str] = False
    #: block-diagonal grouped aggregation (ops.dstd agg_group): packs g
    #: frames (spatial) / joints (temporal) per MXU matmul
    agg_group: Optional[int] = None
    #: jax.checkpoint the op: True recomputes EVERY intermediate in the
    #: backward (pairwise scores / projected features / dynamic
    #: adjacency) — the op is FLOP-cheap (~3% of the MXU roofline) but
    #: HBM-heavy, so full rematerialization cuts live memory ~4x per
    #: block and lets the train step run at much larger batch (a MEMORY
    #: knob: measured slower at b128, PROBES_r04).  "dots" uses the
    #: dots_saveable policy: matmul outputs (projections, mixing,
    #: aggregation) are saved, only the elementwise tanh-broadcast score
    #: tensor is recomputed — a finer memory/time trade, but ALSO
    #: measured slower at b128 (46.7 vs 37.6 ms, PROBES_r05
    #: train_remat_dots): the recompute re-pays the invariant VPU score
    #: cost.  Both modes are memory knobs only.
    remat: Union[bool, str] = False

    @nn.compact
    def __call__(self, x: Array, base_adj: Array, alpha: Array,
                 mask: Optional[Array] = None, *,
                 train: Optional[bool] = None) -> Array:
        if train is None:
            # 'serving' gates the Pallas routing on train-ness, so a
            # caller omitting ``train`` would silently select the eval
            # (Pallas) path in a training context — the measured ~2x
            # regression the knob exists to avoid (ADVICE r4).  Require
            # it explicitly there; elsewhere the default is eval.
            if self.use_pallas == "serving":
                raise ValueError(
                    "use_pallas='serving' routes kernels by train-ness; "
                    "pass train=True/False explicitly")
            train = False
        assert self.mode in ("spatial", "temporal")
        k, cin = self.num_kernels, x.shape[-1]
        co, r, ref = self.out_channels, self.red_channels, self.ref_len

        wf = self.param("wf", kaiming_out(co), (k, cin, co))
        bf = self.param("bf", nn.initializers.zeros, (k, co), jnp.float32)
        wm1 = self.param("wm1", kaiming_out(r), (k, cin, r))
        bm1 = self.param("bm1", nn.initializers.zeros, (k, r), jnp.float32)
        wm2 = self.param("wm2", kaiming_out(r), (k, cin, r))
        bm2 = self.param("bm2", nn.initializers.zeros, (k, r), jnp.float32)
        wrm = self.param("wrm", kaiming_out(ref), (k, r, ref, ref))
        brm = self.param("brm", nn.initializers.zeros, (k, ref), jnp.float32)

        args = (x, base_adj, alpha, wf, bf, wm1, bm1, wm2, bm2, wrm, brm,
                mask)
        if self.use_pallas not in (True, False, "spatial", "temporal",
                                   "serving"):
            raise ValueError(
                f"use_pallas={self.use_pallas!r}: expected True, False, "
                "'spatial', 'temporal' or 'serving' (a typo would "
                "otherwise silently select the default path)")
        if self.pair_flat not in (True, False, "spatial", "temporal"):
            raise ValueError(
                f"pair_flat={self.pair_flat!r}: expected True, False, "
                "'spatial' or 'temporal'")
        # use_pallas: True routes both ops through the fused kernels;
        # "spatial" routes only the spatial op; "serving" routes both ops
        # but ONLY outside training (see the attribute docstring)
        use_pallas = self.use_pallas and (
            self.use_pallas is True
            or self.use_pallas == self.mode
            or (self.use_pallas == "serving" and not train))
        dtype = (None if self.compute_dtype is None
                 else jnp.dtype(self.compute_dtype))
        if use_pallas:
            from ..kernels import fused as fk
            fn = (fk.dstd_spatial if self.mode == "spatial"
                  else fk.dstd_temporal)
            call = functools.partial(fn, agg=self.agg, dtype=dtype)
        else:
            fn = (ops.dstd_spatial if self.mode == "spatial"
                  else ops.dstd_temporal)
            call = functools.partial(
                fn, agg=self.agg, dtype=dtype,
                pair_flat=self.pair_flat in (True, self.mode),
                agg_group=self.agg_group)
        if self.remat == "dots":
            call = jax.checkpoint(
                call, policy=jax.checkpoint_policies.dots_saveable)
        elif self.remat:
            call = jax.checkpoint(call)
        return call(*args)


class DSTDGCB(nn.Module):
    """DSTD-GC block: spatial kernels + BN + residual + PReLU + temporal.

    Reference ``DSTDGCB`` (dstdgcn.py:97-163).  Static adjacency handling:

      * qualitative variant (default): the reference writes the effective
        spatial base as ``A_s[i] * W_s[i] + R_s[i]`` — but its
        ``R_s = nn.Parameter(torch.FloatTensor(self.A_s))`` (dstdgcn.py:109)
        ALIASES A_s's storage (torch.FloatTensor on a same-dtype tensor does
        not copy), so "fixed" A_s tracks every R_s update while autograd
        still treats the ``A_s * W_s`` factor as constant.  The exact
        semantics, reproduced here, are therefore
        ``stop_gradient(R_s) * W_s + R_s`` with ``W_s`` a learnable gate
        (init 0) and ``R_s`` learnable (init = the adjacency stack; the
        reference never calls its re-init, dstdgcn.py:135-139);
      * fast variant (dstdgcn_fast.py:175): a single fully-learnable ``A_s``
        initialized to the adjacency stack.

    Temporal base is ``A_t + R_t`` with fixed ``A_t`` (the reference's
    quirky "neighboor" matrix, see graphs/temporal.py) and learnable ``R_t``
    (init 0); A_t does NOT alias R_t (it is built from numpy, which copies).
    """

    out_channels: int
    time_dim: int
    joint_dim: int
    layout: str = "h36m"
    fast: bool = False
    bn_axis_name: Optional[str] = None
    #: False | True | 'spatial' | 'temporal' | 'serving' (see DSTDGC)
    use_pallas: Union[bool, str] = False
    compute_dtype: Optional[str] = None
    pair_flat: Union[bool, str] = False
    agg_group_spatial: Optional[int] = None
    agg_group_temporal: Optional[int] = None
    remat: Union[bool, str] = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        a_s = sk.stacked_adjacency(self.layout)            # (2, V, V)
        a_t = tg.stacked_adjacency(self.time_dim)          # (1, T, T)
        assert a_s.shape[1] == self.joint_dim == x.shape[2]
        assert x.shape[1] == self.time_dim
        ks, kt = a_s.shape[0], a_t.shape[0]

        if self.fast:
            base_s = self.param("A_s", constant_init(a_s), a_s.shape)
        else:
            w_s = self.param("W_s", nn.initializers.zeros, a_s.shape,
                             jnp.float32)
            r_s = self.param("R_s", constant_init(a_s), a_s.shape)
            base_s = jax.lax.stop_gradient(r_s) * w_s + r_s
        r_t = self.param("R_t", nn.initializers.zeros, a_t.shape, jnp.float32)
        base_t = jnp.asarray(a_t) + r_t

        alpha_sm = self.param("alpha_sm", nn.initializers.zeros, (1,),
                              jnp.float32)
        alpha_tm = self.param("alpha_tm", nn.initializers.zeros, (1,),
                              jnp.float32)

        act_dtype = (jnp.float32 if self.compute_dtype is None
                     else jnp.dtype(self.compute_dtype))
        cin, co = x.shape[-1], self.out_channels
        if cin != co:
            res = nn.Dense(co, kernel_init=kaiming_out(co),
                           name="residual_proj")(x)
            res = JointBatchNorm(axis_name=self.bn_axis_name,
                                 dtype=act_dtype,
                                 name="residual_bn")(res, train=train)
        else:
            res = x

        agg = "left" if self.fast else "right"
        y = DSTDGC(out_channels=co, ref_len=self.time_dim, num_kernels=ks,
                   mode="spatial", agg=agg, use_pallas=self.use_pallas,
                   compute_dtype=self.compute_dtype,
                   pair_flat=self.pair_flat,
                   agg_group=self.agg_group_spatial,
                   remat=self.remat,
                   name="spatial")(x, base_s, alpha_sm, train=train)
        y = JointBatchNorm(axis_name=self.bn_axis_name, dtype=act_dtype,
                           name="bn")(y, train=train)
        y = y + res
        y = PReLU(name="prelu")(y)

        z = DSTDGC(out_channels=co, ref_len=self.joint_dim, num_kernels=kt,
                   mode="temporal", agg=agg, use_pallas=self.use_pallas,
                   compute_dtype=self.compute_dtype,
                   pair_flat=self.pair_flat,
                   agg_group=self.agg_group_temporal,
                   remat=self.remat,
                   name="temporal")(y, base_t, alpha_tm, train=train)
        return z


class ConvTemporalGraphical(nn.Module):
    """Legacy ST-GCN unit (reference dstdgcn.py:166-188).

    Dead in the shipped DSTD-GCN configs (all layers use refine=True) but
    part of the capability surface: learnable per-joint temporal mixing
    ``T (V, T, T)`` followed by per-frame joint mixing ``A (T, V, V)`` plus
    the fixed skeleton adjacency.
    """

    time_dim: int
    joints_dim: int
    layout: str = "h36m"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        t, v = self.time_dim, self.joints_dim
        a = self.param("A", uniform_pm(1.0 / np.sqrt(v)), (t, v, v))
        tm = self.param("T", uniform_pm(1.0 / np.sqrt(t)), (v, t, t))
        a_fixed = jnp.asarray(sk.adjacency(self.layout, "all"))[None]
        # reference: einsum('nctv,vtq->ncqv') then einsum('nctv,tvw->nctw')
        y = jnp.einsum("ntvc,vtq->nqvc", x, tm,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("ntvc,tvw->ntwc", y, a + a_fixed,
                       preferred_element_type=jnp.float32)
        return y


class STGCNNLayer(nn.Module):
    """Refine-or-legacy spatiotemporal layer (reference dstdgcn.py:191-249)."""

    out_channels: int
    time_dim: int
    joints_dim: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: int = 1
    refine: bool = True
    residual: bool = True
    layout: str = "h36m"
    fast: bool = False
    bn_axis_name: Optional[str] = None
    #: False | True | 'spatial' | 'temporal' | 'serving' (see DSTDGC)
    use_pallas: Union[bool, str] = False
    compute_dtype: Optional[str] = None
    pair_flat: Union[bool, str] = False
    agg_group_spatial: Optional[int] = None
    agg_group_temporal: Optional[int] = None
    remat: Union[bool, str] = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        cin, co = x.shape[-1], self.out_channels
        res = None
        if self.residual:
            if self.stride != 1 or cin != co:
                res = nn.Dense(co, kernel_init=kaiming_out(co),
                               name="residual_proj")(x)
            else:
                res = x

        if self.refine:
            y = DSTDGCB(out_channels=co, time_dim=self.time_dim,
                        joint_dim=self.joints_dim, layout=self.layout,
                        fast=self.fast, bn_axis_name=self.bn_axis_name,
                        use_pallas=self.use_pallas,
                        compute_dtype=self.compute_dtype,
                        pair_flat=self.pair_flat,
                        agg_group_spatial=self.agg_group_spatial,
                        agg_group_temporal=self.agg_group_temporal,
                        remat=self.remat,
                        name="block")(
                            x, train=train)
        else:
            y = ConvTemporalGraphical(self.time_dim, self.joints_dim,
                                      self.layout, name="tgcn")(x)
            kh, kw = self.kernel_size
            y = nn.Conv(co, kernel_size=(kh, kw),
                        strides=(self.stride, self.stride), padding="SAME",
                        kernel_init=kaiming_out(co * kh * kw),
                        name="conv")(y)

        if res is not None:
            y = y + res
        return y
