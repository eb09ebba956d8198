"""Loss library (jnp), parity with reference ``engine/utils/loss.py``.

All functions take flat sequences ``(N, T, V*3)`` (the engine's exchange
layout) and an optional per-joint weight vector, returning scalar losses.
Registry keys match the reference ModelWrapper binding
(engine/prediction.py:29-34): jl2 / bl2 / tl2 / cl1 / cl2 / gm2.

Differences from the reference, by design:
  * ``bone_error`` takes the bone-incidence matrix of the *active* layout
    (reference hard-codes the 22-joint H36M matrix and is GPU-only,
    loss.py:97-120);
  * the weighted MPJPE applies joint weights once to the coordinates (the
    reference additionally multiplies the flattened norms by a broadcast of
    the weights, loss.py:63-64, which mixes joints — we keep the intended
    semantics; shipped configs all use ``use_weight: False``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _to_joints(x: Array, w: Optional[Array]) -> Array:
    n, t, vc = x.shape
    x = x.reshape(n, t, vc // 3, 3)
    if w is not None:
        x = x * w[None, None, :, None]
    return x


def mpjpe_error(pred: Array, target: Array,
                weights: Optional[Array] = None) -> Array:
    """Mean per-joint position error (L2 over xyz), reference ``jl2``."""
    p = _to_joints(pred, weights)
    t = _to_joints(target, weights)
    return jnp.mean(jnp.linalg.norm(p - t, axis=-1))


def mae_error(pred: Array, target: Array,
              weights: Optional[Array] = None) -> Array:
    """Coordinate-wise L1, reference ``cl1``."""
    p = _to_joints(pred, weights)
    t = _to_joints(target, weights)
    return jnp.mean(jnp.abs(p - t))


def mse_error(pred: Array, target: Array,
              weights: Optional[Array] = None) -> Array:
    """Reference ``cl2`` (note the reference computes mean(sqrt(d**2)) ==
    mean absolute error; we keep that exact semantic, loss.py:48)."""
    p = _to_joints(pred, weights)
    t = _to_joints(target, weights)
    return jnp.mean(jnp.sqrt((p - t) ** 2))


def transition_error(pred: Array, target: Array,
                     weights: Optional[Array] = None) -> Array:
    """Frame-difference MPJPE, reference ``tl2`` (loss.py:129-146)."""
    dp = pred[:, 1:] - pred[:, :-1]
    dt = target[:, 1:] - target[:, :-1]
    return mpjpe_error(dp, dt, weights)


def gram_matrix_loss(pred: Array, target: Array,
                     weights: Optional[Array] = None) -> Array:
    """Temporal-pair Gram loss, reference ``gm2`` (loss.py:68-78).

    NB the reference computes its target Gram from ``pred`` (loss.py:76), a
    bug making the loss identically zero; we compute it from ``target``.
    """
    del weights
    n, t, vc = pred.shape

    def gram(x):
        g = jnp.concatenate([x[:, 1:], x[:, :-1]], axis=-1)
        g = g / (n * 2 * t * vc)
        return jnp.einsum("nij,nkj->nik", g, g)

    return jnp.sum((gram(pred) - gram(target)) ** 2)


def make_bone_error(incidence: Array) -> Callable:
    """Bone-length L2 loss over a layout's (V, E) incidence matrix."""
    inc = jnp.asarray(incidence)

    def bone_length(x: Array) -> Array:
        n, t, vc = x.shape
        p = x.reshape(n, t, vc // 3, 3)
        # (n, t, 3, V) @ (V, E) -> per-bone difference vectors
        d = jnp.einsum("ntvc,ve->ntce", p, inc)
        return jnp.linalg.norm(d, axis=2)

    def bone_error(pred: Array, target: Array,
                   weights: Optional[Array] = None) -> Array:
        del weights
        return jnp.mean((bone_length(pred) - bone_length(target)) ** 2)

    return bone_error


def registry(bone_incidence: Optional[Array] = None) -> Dict[str, Callable]:
    reg = {
        "jl2": mpjpe_error,
        "tl2": transition_error,
        "cl1": mae_error,
        "cl2": mse_error,
        "gm2": gram_matrix_loss,
    }
    if bone_incidence is not None:
        reg["bl2"] = make_bone_error(bone_incidence)
    return reg


class AccumLoss:
    """Running (sum, count) average, reference loss.py:7-21."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.sum += float(val)
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
