"""DSTD-GCN motion-prediction network (TPU-native).

Reference architecture: ``/root/reference/model/dstdgcn.py:252-317`` (and the
channels-last "fast" variant, ``model/dstdgcn_fast.py:453-614``).  The model
consumes a padded position sequence ``(N, T=input_n+output_n, V, 3)`` whose
output frames were pre-filled with the last observed frame, forms a
(position, motion) 6-channel input, runs an in-layer + ``num_layers``
residual DSTD-GC encoder blocks + an out-layer, and adds back the last
observed frame so the network predicts motion deltas.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import JointBatchNorm, PReLU, STGCNNLayer

Array = jax.Array


class DSTDGCN(nn.Module):
    """Flagship spatiotemporal motion-prediction model.

    Attributes mirror the reference constructor (dstdgcn.py:254-262); the
    extra knobs are TPU-specific: ``fast`` selects the fully-learnable
    spatial adjacency + left-aggregation variant, ``bn_axis_name`` enables
    cross-replica BatchNorm statistics, ``use_pallas`` routes the DSTD-GC
    contractions through the fused Pallas kernels.
    """

    input_channels: int = 6
    input_time_frame: int = 10
    output_time_frame: int = 25
    st_gcnn_dropout: float = 0.1
    joints_to_consider: int = 22
    num_feature: int = 64
    num_layers: int = 7
    layout: str = "h36m"
    fast: bool = False
    bn_axis_name: Optional[str] = None
    use_pallas: Union[bool, str] = False  # True | 'spatial' | 'temporal'
    pair_flat: Union[bool, str] = False
    #: block-diagonal grouped aggregation sizes (must divide T / pad V);
    #: the string "auto" resolves to the measured per-batch-size winner at
    #: trace time (models/autotune.py — VERDICT r4: grouping LOSES at
    #: batch >= 512, f32 wins at batch 1)
    agg_group_spatial: Union[int, str, None] = None
    agg_group_temporal: Union[int, str, None] = None
    #: e.g. "bfloat16": MXU-native mixed precision for the DSTD contractions
    #: (bf16 inputs, f32 accumulation); params and outputs stay f32.
    #: "auto" resolves per batch size (models/autotune.py)
    compute_dtype: Optional[str] = None
    #: jax.checkpoint every DSTD-GC op: True recomputes all
    #: intermediates in the backward (memory knob); "dots" saves matmul
    #: outputs and recomputes only the tanh-broadcast score tensor
    remat: Union[bool, str] = False
    #: configured batch size for "auto" knob resolution (set by the
    #: runner from train_batch_size): keeps the knob set constant across
    #: ragged final batches and eval shapes (models/autotune.py)
    auto_batch_hint: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        n, t, v, c = x.shape
        tt = self.input_time_frame + self.output_time_frame
        assert t == tt, (t, tt)
        assert v == self.joints_to_consider

        # motion decomposition (dstdgcn.py:298-303): last padded frame is the
        # last observed frame; channels = (position, position - last)
        residual = x[:, -1:]
        h = jnp.concatenate([x, x - residual], axis=-1)

        # "auto" knobs resolve to the measured per-batch-size winners here,
        # at trace time (n is a static shape under jit) — submodules only
        # ever see concrete values
        from .autotune import resolve_knob
        hint = self.auto_batch_hint
        common = dict(time_dim=tt, joints_dim=v, layout=self.layout,
                      fast=self.fast, bn_axis_name=self.bn_axis_name,
                      use_pallas=self.use_pallas,
                      compute_dtype=resolve_knob(
                          "compute_dtype", self.compute_dtype, n, hint),
                      pair_flat=self.pair_flat,
                      agg_group_spatial=resolve_knob(
                          "agg_group_spatial", self.agg_group_spatial, n,
                          hint),
                      agg_group_temporal=resolve_knob(
                          "agg_group_temporal", self.agg_group_temporal, n,
                          hint),
                      remat=self.remat,
                      refine=True)

        h = STGCNNLayer(out_channels=self.num_feature, residual=False,
                        name="conv_st_in", **common)(h, train=train)
        h = JointBatchNorm(axis_name=self.bn_axis_name, name="bn_in")(
            h, train=train)
        h = PReLU(name="prelu")(h)
        h = nn.Dropout(self.st_gcnn_dropout, name="do_in")(
            h, deterministic=not train)

        for i in range(self.num_layers):
            h = STGCNNLayer(out_channels=self.num_feature, residual=True,
                            name=f"encoder_{i}", **common)(h, train=train)
            h = JointBatchNorm(axis_name=self.bn_axis_name,
                               name=f"encoder_bn_{i}")(h, train=train)
            h = PReLU(name=f"encoder_prelu_{i}")(h)

        h = STGCNNLayer(out_channels=self.input_channels // 2, residual=False,
                        name="conv_st_out", **common)(h, train=train)
        return h + residual


_REGISTRY = {
    "dstdgcn": dict(fast=False),
    "dstdgcn_fast": dict(fast=True),
}


def get_model(name: str, **opts: Any) -> DSTDGCN:
    """Model factory, parity with reference ``model/__init__.py:11-14``.

    ``opts`` follows the reference config convention: the model's own
    hyper-parameters live under ``opts[name]``.
    """
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}")
    kwargs = dict(opts.get(name, {}))
    for k in ("name", "load", "ckpt"):
        kwargs.pop(k, None)
    kwargs.update(_REGISTRY[name])
    for k in ("bn_axis_name", "use_pallas", "compute_dtype", "pair_flat",
              "agg_group_spatial", "agg_group_temporal", "remat",
              "auto_batch_hint"):
        if k in opts:
            kwargs[k] = opts[k]
    return DSTDGCN(**kwargs)
