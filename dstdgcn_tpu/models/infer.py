"""Fused inference path for the flagship DSTDGCN.

Serving-oriented eval forward: the ``num_layers`` residual encoder layers
(reference model/dstdgcn.py:310-311) run as ONE whole-encoder Pallas kernel
(:func:`dstdgcn_tpu.kernels.fused.dstd_encoder_chain`) — activations stay
in VMEM across every DSTD-GC / BatchNorm / residual / PReLU of the encoder
— while the channel-changing in/out layers (conv_st_in 6->C,
conv_st_out C->3, dstdgcn.py:305-313) run through the XLA oracle ops.

Works on a trained model's ``variables`` tree directly (params +
batch_stats as produced by :class:`dstdgcn_tpu.models.DSTDGCN`), so a
checkpoint trained on the standard path serves on the fused path with
eval-mode parity (golden-tested in tests/test_kernels.py).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from ..graphs import skeleton as sk
from ..graphs import temporal as tg
from ..kernels import fused
from ..ops import dstd as oracle

Array = jax.Array


def _affine(params: Mapping, stats: Mapping) -> Array:
    return fused.bn_affine(params["scale"], params["bias"],
                           stats["mean"], stats["var"])


def _dstd_args(mod: Mapping):
    return (mod["wf"], mod["bf"], mod["wm1"], mod["bm1"], mod["wm2"],
            mod["bm2"], mod["wrm"], mod["brm"])


def _block_bases(blk: Mapping, time_dim: int, fast: bool):
    """Effective static adjacencies of a DSTDGCB (models/layers.py:226-234;
    reference R_s-aliasing semantics: base_s == R_s * (1 + W_s))."""
    if fast:
        base_s = blk["A_s"]
    else:
        base_s = blk["R_s"] * (1.0 + blk["W_s"])
    base_t = jnp.asarray(tg.stacked_adjacency(time_dim)) + blk["R_t"]
    return base_s, base_t


def encoder_chain_params(variables: Mapping[str, Any], num_layers: int,
                         time_dim: int, fast: bool = False):
    """Extract ``dstd_encoder_chain`` layer params from a model tree."""
    p, s = variables["params"], variables["batch_stats"]
    layers = []
    for i in range(num_layers):
        blk = p[f"encoder_{i}"]["block"]
        base_s, base_t = _block_bases(blk, time_dim, fast)
        sp = (base_s, blk["alpha_sm"], *_dstd_args(blk["spatial"]))
        tm = (base_t, blk["alpha_tm"], *_dstd_args(blk["temporal"]))
        aff1 = _affine(blk["bn"], s[f"encoder_{i}"]["block"]["bn"])
        aff2 = _affine(p[f"encoder_bn_{i}"], s[f"encoder_bn_{i}"])
        pa = jnp.stack([blk["prelu"]["negative_slope"].reshape(()),
                        p[f"encoder_prelu_{i}"]["negative_slope"]
                        .reshape(())])
        layers.append((sp, tm, aff1, aff2, pa))
    return layers


def _prelu(x: Array, a: Array) -> Array:
    return jnp.where(x >= 0, x, a.reshape(()) * x)


def _apply_affine(x: Array, aff: Array) -> Array:
    return x * aff[0][None, None] + aff[1][None, None]


def _in_out_layer(x: Array, blk: Mapping, stats: Mapping, time_dim: int,
                  fast: bool, agg: str, dtype,
                  agg_group=(None, None)) -> Array:
    """One channel-changing ST_GCNN layer (refine, residual=False):
    the DSTDGCB body with a projected residual (models/layers.py:243-271)."""
    res = x @ blk["residual_proj"]["kernel"] + blk["residual_proj"]["bias"]
    res = _apply_affine(res, _affine(blk["residual_bn"],
                                     stats["residual_bn"]))
    base_s, base_t = _block_bases(blk, time_dim, fast)
    y = oracle.dstd_spatial(x, base_s, blk["alpha_sm"],
                            *_dstd_args(blk["spatial"]), agg=agg,
                            dtype=dtype, agg_group=agg_group[0])
    y = _apply_affine(y, _affine(blk["bn"], stats["bn"]))
    y = _prelu(y + res, blk["prelu"]["negative_slope"])
    z = oracle.dstd_temporal(y, base_t, blk["alpha_tm"],
                             *_dstd_args(blk["temporal"]), agg=agg,
                             dtype=dtype, agg_group=agg_group[1])
    return z.astype(jnp.float32)


def fused_eval_forward(variables: Mapping[str, Any], x: Array,
                       num_layers: int, fast: bool = False,
                       dtype=None, nb=None,
                       agg_group=(None, None)) -> Array:
    """Eval-mode DSTDGCN forward with the fused whole-encoder kernel.

    Semantics match ``model.apply(variables, x, train=False)`` for a
    :class:`~dstdgcn_tpu.models.DSTDGCN` built with default knobs
    (reference forward: model/dstdgcn.py:293-317).  ``dtype`` (e.g.
    ``jnp.bfloat16``) selects MXU-native mixed precision inside the fused
    kernel; ``nb`` overrides samples per grid program.
    """
    p, s = variables["params"], variables["batch_stats"]
    t = x.shape[1]
    agg = "left" if fast else "right"

    residual = x[:, -1:]
    h = jnp.concatenate([x, x - residual], axis=-1)
    h = _in_out_layer(h, p["conv_st_in"]["block"],
                      s["conv_st_in"]["block"], t, fast, agg, dtype,
                      agg_group)
    h = _apply_affine(h, _affine(p["bn_in"], s["bn_in"]))
    h = _prelu(h, p["prelu"]["negative_slope"])      # dropout: eval = id

    layers = encoder_chain_params(variables, num_layers, t, fast)
    h = fused.dstd_encoder_chain(h, layers, agg=agg, dtype=dtype, nb=nb)

    h = _in_out_layer(h, p["conv_st_out"]["block"],
                      s["conv_st_out"]["block"], t, fast, agg, dtype,
                      agg_group)
    return h + residual
