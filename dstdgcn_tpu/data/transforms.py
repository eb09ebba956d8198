"""Layout, DCT, and scale transforms.

Parity with reference ``engine/utils/transform.py`` (layout transforms) and
``dataset/utils.py:953-963, 2116-2236`` (DCT / scale normalizers), expressed
as pure jnp/numpy functions usable inside jitted steps.

The engine's exchange layout is flat ``(B, T, V*C)``; the model consumes
``(B, T, V, C)`` channels-last.  ``tsc`` is the transform used by every
shipped config.  The ``tscr_*`` variants additionally reorder joints into a
limb-grouped ordering with fixed permutations.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# limb-grouped joint orders (reference transform.py:58-143)
_TSCR_ORDERS = {
    "h36m": [21, 20, 19, 18, 17, 12, 13, 14, 15, 16, 11, 10, 9, 8, 4, 5, 6,
             7, 0, 1, 2, 3],
    "cmu": [23, 21, 20, 14, 15, 17, 12, 11, 9, 5, 6, 7, 1, 2, 3, 0, 4, 8,
            10, 13, 19, 16, 18, 22, 24],
    "3dpw": [22, 20, 18, 16, 13, 12, 15, 17, 19, 21, 14, 11, 8, 5, 2, 1, 4,
             7, 10, 0, 3, 6, 9],
}


def _inverse_order(order):
    inv = np.empty(len(order), np.int64)
    inv[np.asarray(order)] = np.arange(len(order))
    return inv.tolist()


def st_transform(x: Array) -> Array:
    """(B, T, S) -> (B, S, T)."""
    return jnp.swapaxes(x, 1, 2)


def st_inverse(x: Array) -> Array:
    return jnp.swapaxes(x, 1, 2)


def tsc_transform(x: Array, c: int = 3) -> Array:
    """(B, T, S*C) -> (B, T, S, C)."""
    b, t, sc = x.shape
    return x.reshape(b, t, sc // c, c)


def tsc_inverse(x: Array, c: int = 3) -> Array:
    b, t, s, cc = x.shape
    return x.reshape(b, t, s * cc)


def cst_transform(x: Array, c: int = 3) -> Array:
    """(B, T, S*C) -> (B, C, S, T)."""
    b, t, sc = x.shape
    return jnp.transpose(x.reshape(b, t, sc // c, c), (0, 3, 2, 1))


def cst_inverse(x: Array, c: int = 3) -> Array:
    b, cc, s, t = x.shape
    return jnp.transpose(x, (0, 3, 2, 1)).reshape(b, t, s * cc)


def _make_tscr(layout: str):
    fwd = _TSCR_ORDERS[layout]
    inv = _inverse_order(fwd)

    def transform(x: Array, c: int = 3) -> Array:
        y = tsc_transform(x, c)
        return y[:, :, jnp.asarray(fwd), :]

    def inverse(x: Array, c: int = 3) -> Array:
        return tsc_inverse(x[:, :, jnp.asarray(inv), :], c)

    return transform, inverse


TRANSFORMS: Dict[str, Tuple[Optional[Callable], Optional[Callable]]] = {
    "st": (st_transform, st_inverse),
    "tsc": (tsc_transform, tsc_inverse),
    "cst": (cst_transform, cst_inverse),
    "no": (None, None),
}
for _lay in _TSCR_ORDERS:
    TRANSFORMS[f"tscr_{_lay}"] = _make_tscr(_lay)


def get_transform(name: str):
    """-> (transform, inverse) pair; both None for ``no``."""
    try:
        return TRANSFORMS[name]
    except KeyError:
        raise ValueError(f"unknown transform {name!r}") from None


# ---------------------------------------------------------------------------
# DCT temporal transform (reference get_dct_matrix, dataset/utils.py:953-963)
# ---------------------------------------------------------------------------

def dct_matrix(n: int) -> Tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    w = np.where(k == 0, np.sqrt(1.0 / n), np.sqrt(2.0 / n))
    m = w * np.cos(np.pi * (i + 0.5) * k / n)
    return m.astype(np.float64), np.linalg.inv(m).astype(np.float64)


class TimeTransform:
    """Truncated-DCT temporal compression (dataset/utils.py:2116-2186)."""

    def __init__(self, seq_len: int, dct_used: int):
        self.seq_len = seq_len
        self.dct_used = dct_used
        dct, idct = dct_matrix(seq_len)
        self.dct = dct[:dct_used].astype(np.float32)       # (D, T)
        self.idct = idct[:, :dct_used].astype(np.float32)  # (T, D)

    def transform(self, x):
        """(N, T, S) -> (N, D, S)."""
        m = jnp.asarray(self.dct) if isinstance(x, jax.Array) else self.dct
        xp = jnp if isinstance(x, jax.Array) else np
        return xp.einsum("dt,nts->nds", m, x)

    def inverse(self, x):
        """(N, D, S) -> (N, T, S)."""
        m = jnp.asarray(self.idct) if isinstance(x, jax.Array) else self.idct
        xp = jnp if isinstance(x, jax.Array) else np
        return xp.einsum("td,nds->nts", m, x)


class MeanStdNorm:
    """Per-dimension standardization (dataset/utils.py:2210-2236)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)[None, None, :]
        self.std = np.asarray(std, np.float32)[None, None, :]

    def transform(self, x):
        return (x - _cast(self.mean, x)) / _cast(self.std, x)

    def inverse(self, x):
        return x * _cast(self.std, x) + _cast(self.mean, x)


class MinMaxNorm:
    """[-1, 1] min-max scaling (dataset/utils.py:2189-2207)."""

    def __init__(self, v_min, v_max):
        self.v_min = np.asarray(v_min, np.float32)
        self.gap = np.asarray(v_max - v_min, np.float32)

    def transform(self, x):
        return (x - _cast(self.v_min, x)) / _cast(self.gap, x) * 2 - 1

    def inverse(self, x):
        return (x + 1) / 2 * _cast(self.gap, x) + _cast(self.v_min, x)


def _cast(m, x):
    return jnp.asarray(m) if isinstance(x, jax.Array) else m


def mirror_sequences(seqs: np.ndarray, right, left) -> np.ndarray:
    """Left/right mirror augmentation over flat (N, T, V*3) sequences.

    Swaps the given joint index lists and negates x (reference
    dataset/h36m.py:100-116 and the cmu/pw3d equivalents).
    """
    n, t, vc = seqs.shape
    s = seqs.reshape(n, t, vc // 3, 3)
    m = s.copy()
    m[:, :, list(right)] = s[:, :, list(left)]
    m[:, :, list(left)] = s[:, :, list(right)]
    m[..., 0] = -m[..., 0]
    return m.reshape(n, t, vc)


def padding_indices(input_n: int, output_n: int,
                    padding: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """(forward, inverse-time) input frame index maps.

    Forward: input frames then ``output_n`` copies of the last input frame;
    inverse: the time-reversed view used by inverse-sequence training
    (reference dataset/h36m.py:53-60).
    """
    if padding:
        i_idx = np.concatenate([np.arange(input_n),
                                np.full(output_n, input_n - 1)])
        i_idx_inv = np.concatenate([
            np.arange(output_n, output_n + input_n)[::-1],
            np.full(output_n, output_n)])
    else:
        i_idx = np.arange(input_n + output_n)
        i_idx_inv = i_idx[::-1]
    return i_idx.astype(np.int64), i_idx_inv.astype(np.int64)
