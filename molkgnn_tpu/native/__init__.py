"""Native (C++) host-side helpers with transparent numpy fallback.

Provides:
  * ``floyd_warshall`` / ``gen_edge_input`` — all-pairs shortest paths and
    edge-feature path sequences (functional parity with the reference's
    dead Cython module, /root/reference/algos.pyx — SURVEY C23; unused by
    any model there, exposed as a utility here).
  * range-gather primitives backing the host batch packer.

The shared library builds on first use with g++ (cached next to the
source); if no compiler is available everything falls back to numpy
implementations with identical semantics (cross-checked in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "graph_ops.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "src", "libgraph_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

UNREACHABLE = 510


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", _SRC,
                        "-o", _LIB_PATH,
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.floyd_warshall.argtypes = [i64p, ctypes.c_int64, i64p, i64p]
        lib.gen_edge_input.argtypes = [
            i64p, i64p, f32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, f32p,
        ]
        lib.ranges_gather_f32.argtypes = [
            f32p, ctypes.c_int64, i64p, i64p, ctypes.c_int64, f32p,
        ]
        lib.ranges_gather_offset_i32.argtypes = [
            i32p, ctypes.c_int64, i64p, i64p, i32p, ctypes.c_int64, i32p,
        ]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _build() is not None


# ---------------------------------------------------------------------------
def floyd_warshall(adj: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs shortest paths. Returns (dist, pred); dist==510 where
    unreachable (the reference's sentinel, algos.pyx:25)."""
    adj = np.ascontiguousarray(adj, np.int64)
    n = adj.shape[0]
    lib = _build()
    dist = np.empty((n, n), np.int64)
    pred = np.empty((n, n), np.int64)
    if lib is not None:
        lib.floyd_warshall(adj, n, dist, pred)
        return dist, pred
    # numpy fallback
    dist[:] = np.where(adj > 0, 1, UNREACHABLE)
    np.fill_diagonal(dist, 0)
    pred[:] = -1
    for k in range(n):
        cand = dist[:, k][:, None] + dist[k, :][None, :]
        better = cand < dist
        dist[better] = cand[better]
        pred[better] = k
    return dist, pred


def _walk_path(pred: np.ndarray, i: int, j: int) -> list:
    k = pred[i, j]
    if k < 0:
        return [i, j]
    left = _walk_path(pred, i, k)
    right = _walk_path(pred, k, j)
    return left + right[1:]


def gen_edge_input(
    dist: np.ndarray,
    pred: np.ndarray,
    edge_feat: np.ndarray,
    max_dist: Optional[int] = None,
) -> np.ndarray:
    """Edge-feature sequences along shortest paths: [n, n, max_dist, fdim]
    (reference gen_edge_input, algos.pyx:65-91)."""
    n, fdim = dist.shape[0], edge_feat.shape[-1]
    if max_dist is None:
        finite = dist[dist < UNREACHABLE]
        max_dist = int(finite.max()) if finite.size else 1
    max_dist = max(int(max_dist), 1)
    lib = _build()
    if lib is not None:
        out = np.zeros((n, n, max_dist, fdim), np.float32)
        lib.gen_edge_input(
            np.ascontiguousarray(dist, np.int64),
            np.ascontiguousarray(pred, np.int64),
            np.ascontiguousarray(edge_feat, np.float32),
            n, fdim, max_dist, out,
        )
        return out
    out = np.zeros((n, n, max_dist, fdim), np.float32)
    for i in range(n):
        for j in range(n):
            if i == j or dist[i, j] >= UNREACHABLE:
                continue
            path = _walk_path(pred, i, j)
            for h in range(min(len(path) - 1, max_dist)):
                out[i, j, h] = edge_feat[path[h], path[h + 1]]
    return out
