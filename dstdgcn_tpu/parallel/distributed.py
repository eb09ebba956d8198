"""Multi-host launch: ``jax.distributed`` initialization + process info.

The reference is strictly single-process (SURVEY.md §2.6: no NCCL/Gloo/MPI
anywhere; ``utils/logger.py:15-19`` carries an always-0 rank).  This module
creates the launch layer the TPU framework needs (SURVEY §7 step 8): each
host process calls :func:`initialize` before touching devices, after which
``jax.devices()`` is the *global* device set, meshes built by
``parallel.mesh.make_mesh`` span all hosts, and XLA lowers collectives onto
ICI/DCN.  Input pipelines use :func:`process_info` to read their per-process
shard (``data.loader.Loader(process_index, process_count)``), and batches are
assembled into global arrays with :func:`make_global_batch`.

Launch (one process per host), e.g.::

    DSTDGCN_COORDINATOR=host0:1234 DSTDGCN_NUM_PROCESSES=2 \
    DSTDGCN_PROCESS_ID=0 python main.py --config ... --run_dir ...

or via the config block::

    parallel:
      distributed:
        coordinator: host0:1234    # or "auto" on TPU pods
        num_processes: 2
        process_id: 0              # usually from the env instead

On TPU pod slices every field may be omitted (``coordinator: auto``):
``jax.distributed.initialize()`` discovers the topology from the TPU
runtime metadata.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax

__all__ = ["initialize", "process_info", "make_global_batch"]

_INITIALIZED = False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def initialize(dist_cfg: Optional[Dict[str, Any]] = None,
               logger=None) -> Tuple[int, int]:
    """Initialize ``jax.distributed`` from config/env; idempotent.

    Resolution order per field: the ``DSTDGCN_COORDINATOR`` /
    ``DSTDGCN_NUM_PROCESSES`` / ``DSTDGCN_PROCESS_ID`` env vars FIRST
    (one launch command per host with per-process env, as the config
    files document: "env vars override per process"), then the config
    block, then JAX auto-detection (TPU pod metadata).  A missing config
    block AND missing env vars means single-process mode: no-op,
    returns (0, 1).

    (Round-5 fix: config-first resolution let a shipped
    ``coordinator: auto`` shadow the env coordinator, so the documented
    multi-host launch recipe crashed with "coordinator_address should
    be defined" — found by actually running main.py two-process.)

    Returns ``(process_index, process_count)``.
    """
    global _INITIALIZED
    cfg = dict(dist_cfg or {})
    coord = os.environ.get("DSTDGCN_COORDINATOR") or cfg.get("coordinator")
    nproc = _env_int("DSTDGCN_NUM_PROCESSES")
    if nproc is None and cfg.get("num_processes") is not None:
        nproc = int(cfg["num_processes"])
    pid = _env_int("DSTDGCN_PROCESS_ID")
    if pid is None and cfg.get("process_id") is not None:
        pid = int(cfg["process_id"])

    if not cfg and coord is None and nproc is None:
        return 0, 1                       # single-process launch
    if not _INITIALIZED:
        kwargs: Dict[str, Any] = {}
        if coord not in (None, "auto"):
            kwargs["coordinator_address"] = coord
        if nproc is not None:
            kwargs["num_processes"] = nproc
        if pid is not None:
            kwargs["process_id"] = pid
        if kwargs:
            jax.distributed.initialize(**kwargs)
            _INITIALIZED = True
        else:
            # `coordinator: auto` with nothing else: rely on TPU-pod
            # topology auto-discovery; off-pod (CPU/dev runs of a multihost
            # config) this raises quickly — fall back to single-process
            try:
                jax.distributed.initialize()
                _INITIALIZED = True
            except (RuntimeError, ValueError) as e:
                if logger is not None:
                    logger.info(f"single-process fallback ({e})")
                return 0, 1
    info = process_info()
    if logger is not None:
        logger.info(
            f"jax.distributed: process {info[0]}/{info[1]}, "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices")
    return info


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) of this launch (single-process safe)."""
    return jax.process_index(), jax.process_count()


def make_global_batch(local_arrays, sharding):
    """Assemble per-process local batch shards into global ``jax.Array``s.

    Each process holds ``global_batch / process_count`` rows (the
    ``Loader`` per-process split); under multi-process this stitches them
    into one addressable global array per input, placed with ``sharding``.
    Single-process falls back to a plain ``device_put``.
    """
    if jax.process_count() == 1:
        return tuple(jax.device_put(a, sharding) for a in local_arrays)
    return tuple(
        jax.make_array_from_process_local_data(sharding, a)
        for a in local_arrays)
