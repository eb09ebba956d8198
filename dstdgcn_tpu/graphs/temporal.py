"""Temporal (frame) graph builders.

Parity with reference ``model/layers/time.py:4-41``: dense (T, T) adjacencies
over the frame axis.  Kinds:

  * ``self``      identity
  * ``neighbor``  the reference's "neighboor" matrix (see note below)
  * ``inout``     complete bipartite input-block <-> output-block
  * ``all``       neighbor then inout blocks applied on top
  * ``tridiag``   a true symmetric tri-diagonal (self + both neighbors) —
                  what the reference presumably *intended*

NOTE on ``neighbor``: the reference builds it with whole-block assignments
``adj[:-1, 1:] = eye(T-1); adj[1:, :-1] = eye(T-1)`` (time.py:20-22).  Each
assignment *overwrites* the previous content of its block, so the result is
NOT tri-diagonal: the sub-diagonal is all ones, but the main diagonal
survives only at (0,0) and (T-1,T-1) and the super-diagonal only at (0,1)
and (T-2,T-1).  The trained model depends on this exact matrix, so we
reproduce it bit-for-bit (and expose ``tridiag`` separately).

``stacked_adjacency`` returns the (1, T, T) ``[neighbor]`` stack consumed by
DSTD-GC temporal kernels (time.py:37-41).
"""

from __future__ import annotations

import numpy as np

__all__ = ["adjacency", "stacked_adjacency"]

#: reference hard-codes input_length = 10 (time.py:7)
DEFAULT_INPUT_LENGTH = 10


def adjacency(seq_length: int, kind: str = "neighbor",
              input_length: int = DEFAULT_INPUT_LENGTH) -> np.ndarray:
    t = seq_length
    if kind == "self":
        return np.eye(t, dtype=np.float32)
    if kind in ("neighbor", "neighboor"):  # reference spelling kept as alias
        adj = np.eye(t, dtype=np.float32)
        # block overwrites, exactly as time.py:20-22 (see module docstring)
        adj[:-1, 1:] = np.eye(t - 1, dtype=np.float32)
        adj[1:, :-1] = np.eye(t - 1, dtype=np.float32)
        return adj
    if kind == "tridiag":
        adj = np.eye(t, dtype=np.float32)
        idx = np.arange(t - 1)
        adj[idx, idx + 1] = 1.0
        adj[idx + 1, idx] = 1.0
        return adj
    if kind == "inout":
        adj = np.zeros((t, t), np.float32)
        adj[:input_length, input_length:] = 1.0
        adj[input_length:, :input_length] = 1.0
        return adj
    if kind == "all":
        adj = adjacency(t, "neighbor")
        adj[:input_length, input_length:] = 1.0
        adj[input_length:, :input_length] = 1.0
        return adj
    raise ValueError(f"invalid temporal adjacency kind {kind!r}")


def stacked_adjacency(seq_length: int) -> np.ndarray:
    """(1, T, T) stack of [neighbor] (time.py:37-41)."""
    return adjacency(seq_length, "neighbor")[None]
