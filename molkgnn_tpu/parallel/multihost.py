"""Multi-host (pod-slice) training setup.

The reference is strictly single-GPU (SURVEY §2.3); this is the TPU-native
scaling recipe for N hosts x M chips:

  * `initialize()` wires `jax.distributed` (coordinator from env or args) —
    after it, `jax.devices()` spans the slice and a global Mesh covers every
    chip; gradient all-reduce rides ICI within a slice and DCN across
    slices, inserted by XLA from the same `pmean` the single-host DP step
    uses (parallel/data_parallel.py — nothing else changes).
  * `host_shard(ids, ...)` statically partitions the sampled molecule ids
    so each host packs/feeds only its own chips — the input pipeline scales
    with hosts, and no cross-host data movement happens outside the
    gradient collective.
  * `global_data_mesh()` builds the 'data' mesh over all global devices.

Validated logically via the virtual-device mesh tests (a real multi-host
run only needs `initialize()` first — the step functions are unchanged).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (idempotent; env-driven when args omitted:
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or the TPU pod
    auto-detection when nothing is set).

    MUST run before anything touches a backend: even ``jax.process_count()``
    initializes XLA, after which distributed setup is rejected (the r2
    version of this guard had exactly that bug — it could never initialize).
    The already-initialized check therefore reads the distributed global
    state directly. Exercised for real (2 processes, gloo collectives) by
    tests/test_multihost_mp.py.
    """
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        # Explicit multi-process setup: let failures propagate.
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(
                num_processes
                if num_processes is not None
                else os.environ.get("NUM_PROCESSES", "1")
            ),
            process_id=int(
                process_id
                if process_id is not None
                else os.environ.get("PROCESS_ID", "0")
            ),
        )
        return
    try:
        jax.distributed.initialize()  # pod auto-detection
    except (RuntimeError, ValueError):
        pass  # single-process


def global_data_mesh(axis: str = "data") -> Mesh:
    return Mesh(np.array(jax.devices()), (axis,))


def host_shard(
    items: Sequence, process_id: Optional[int] = None,
    process_count: Optional[int] = None,
):
    """Contiguous static partition of ``items`` for this host's pipeline."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    n = len(items)
    per = -(-n // pcount)
    return items[pid * per : (pid + 1) * per]


def local_device_batches(global_batch_ids: np.ndarray) -> np.ndarray:
    """Split a global per-step id matrix [n_global_devices, B] down to this
    host's rows (feed to stack_shards/shard_map with local devices)."""
    n_local = jax.local_device_count()
    start = jax.process_index() * n_local
    return global_batch_ids[start : start + n_local]
