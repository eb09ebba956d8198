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
    """Re-wrap raw key data where the target holds typed PRNG keys."""
    return jax.tree.map(
        lambda x, t: jax.random.wrap_key_data(jnp_asarray_u32(x))
        if hasattr(t, "dtype") and jax.dtypes.issubdtype(
            t.dtype, jax.dtypes.prng_key) else x, tree, target)


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


def restore_checkpoint(path: str, target: Any) -> Tuple[Any, Dict[str, Any]]:
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        payload = json.loads(f.read(n).decode())
        blob = f.read()
    raw = serialization.from_bytes(_unkey(jax.device_get(target)), blob)
    state = _rekey(raw, target)
    return state, payload
