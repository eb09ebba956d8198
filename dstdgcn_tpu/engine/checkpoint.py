"""Checkpoint save/restore for engine state.

Deterministic-resume checkpointing of the full pytree (params, batch stats,
optimizer state, PRNG key) plus scalar metadata, replacing the reference's
``torch.save`` dict (engine/prediction.py:159-182).  Uses flax msgpack
serialization (host-independent, no pickle of arrays); unlike the reference,
optimizer/schedule state fully round-trips (the reference saves but never
restores its scheduler, prediction.py:159-169).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "restore_checkpoint"]


def _unkey(tree):
    """Typed PRNG keys -> raw uint32 data (msgpack-serializable)."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x)
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key) else x, tree)


def _rekey(tree, target):
    """Re-wrap raw key data where the target holds typed PRNG keys.

    The wrap must use the TARGET key's impl — ``wrap_key_data`` defaults
    to threefry, which rejects the (4,)-word key data of the ``rbg``
    dropout keys the tuned configs ship (``engine.prng_impl: rbg``).  A
    cross-impl restore (e.g. a threefry-era checkpoint resumed under an
    rbg config, or vice versa) has incompatible key-data shapes; rather
    than crash the resume, keep the engine's current key — only the
    dropout stream changes, which carries no model/optimizer state.
    """
    def rewrap(x, t):
        if not (hasattr(t, "dtype") and jax.dtypes.issubdtype(
                t.dtype, jax.dtypes.prng_key)):
            return x
        try:
            return jax.random.wrap_key_data(
                jnp_asarray_u32(x), impl=jax.random.key_impl(t))
        except (TypeError, ValueError):
            return t   # impl mismatch: keep the live key (fresh stream)

    return jax.tree.map(rewrap, tree, target)


def jnp_asarray_u32(x):
    import jax.numpy as jnp
    return jnp.asarray(x, jnp.uint32)


def save_checkpoint(path: str, state: Any, payload: Dict[str, Any]) -> None:
    blob = serialization.to_bytes(_unkey(jax.device_get(state)))
    meta = json.dumps(payload).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(len(meta).to_bytes(8, "little"))
        f.write(meta)
        f.write(blob)
    os.replace(tmp, path)  # atomic publish: no torn checkpoints on failure


def _alt_key_width(unkeyed, target):
    """Swap PRNG key-data trailing width (2,)<->(4,) in the restore
    template: a checkpoint written under a different ``engine.prng_impl``
    (threefry keys are 2 uint32 words, rbg keys 4) otherwise fails
    msgpack shape validation before _rekey can handle it."""
    def alt(x, t):
        if hasattr(t, "dtype") and jax.dtypes.issubdtype(
                t.dtype, jax.dtypes.prng_key):
            w = 2 if x.shape[-1] == 4 else 4
            return np.zeros(x.shape[:-1] + (w,), np.uint32)
        return x

    return jax.tree.map(alt, unkeyed, target)


def restore_checkpoint(path: str, target: Any) -> Tuple[Any, Dict[str, Any]]:
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        payload = json.loads(f.read(n).decode())
        blob = f.read()
    target = jax.device_get(target)
    unkeyed = _unkey(target)
    try:
        raw = serialization.from_bytes(unkeyed, blob)
    except ValueError:
        # dropout key saved under a different prng impl: retry with the
        # alternate key-data width; _rekey then keeps the live key
        raw = serialization.from_bytes(_alt_key_width(unkeyed, target),
                                       blob)
    state = _rekey(raw, target)
    return state, payload
