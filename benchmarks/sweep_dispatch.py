"""Sweep (batch, scan_steps, dtype) fixed-block step time.

benchmarks/device_step_time.py showed the scan-10 dispatch costs ~1.5 ms
wall at BOTH batch 256 and 1024 — the tunneled link's round-trip pins the
dispatch, and device compute hides under it. Throughput then scales with
(batch x scan) until compute fills the window. This sweep finds the knee.

Run on the TPU: timeout 1800 python -u benchmarks/sweep_dispatch.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_balanced import build  # noqa: E402


def measure(bs, scan, dtype, ds, edge_counts):
    """Fixed-block window with an honest end: the window closes on a VALUE
    fetch of the final loss, not block_until_ready. r3 measured the
    sync-only variant reporting up to 2.4x the bf16 MXU roofline at
    scan=40 (4 dispatches/window) — physically impossible, i.e. readiness
    resolved before the queue drained on the relay backend. A value cannot
    exist before the compute that produces it. Windows are also floored at
    8 dispatches so the one-RTT fetch cost stays amortized."""
    import numpy as np
    import jax

    tr, blk = build(bs, False, ds, matmul_dtype=dtype, scan_steps=scan)
    block = next(blk)
    real_edges = int(edge_counts[block[block >= 0]].sum())
    state = tr.state
    state, loss = tr._train_steps_scan(state, tr._device_data, block)
    jax.block_until_ready(loss)
    float(np.asarray(loss[-1]))  # first-readback penalty, untimed

    best = None
    for _ in range(3):
        reps = max(8, 160 // scan)
        t0 = time.perf_counter()
        for _ in range(reps):
            state, loss = tr._train_steps_scan(state, tr._device_data, block)
        assert float(np.asarray(loss[-1])) is not None  # true sync
        dt = time.perf_counter() - t0
        rate = reps * real_edges / dt
        ms = 1e3 * dt / (reps * scan)
        if best is None or rate > best[0]:
            best = (rate, ms)
    del tr
    return {"edges_per_s": round(best[0], 1), "ms_per_step": round(best[1], 4)}


def main():
    from molkgnn_tpu.data.dataset import make_synthetic_dataset

    results = {}
    pools = {}
    for bs, scan, dtype in [
        (256, 10, None),
        (256, 40, None),
        (1024, 10, "bfloat16"),
        (1024, 40, "bfloat16"),
        (2048, 20, "bfloat16"),
        (4096, 10, "bfloat16"),
        (4096, 20, "bfloat16"),
    ]:
        pool = min(4 * bs, 8192)
        if pool not in pools:
            t0 = time.time()
            ds = make_synthetic_dataset(seed=0, num_graphs=pool)
            pools[pool] = (
                ds,
                np.array([g.num_edges for g in ds.graphs]),
            )
            print(f"pool {pool}: built in {time.time()-t0:.0f}s", flush=True)
        ds, ec = pools[pool]
        key = f"b{bs}_scan{scan}_{dtype or 'fp32'}"
        results[key] = measure(bs, scan, dtype, ds, ec)
        print(key, results[key], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
