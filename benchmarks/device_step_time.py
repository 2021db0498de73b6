"""Device-only step time: cover vs balanced programs, fixed id block.

Dispatches the SAME [K, B] id block repeatedly (no host stream in the
loop), interleaving the two programs per window. Isolates the compiled
program's device+dispatch cost from the epoch-stream host work that
benchmarks/compare_balanced.py includes.

Run on the TPU: timeout 1200 python -u benchmarks/device_step_time.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_balanced import build  # noqa: E402


def main():
    import jax

    from molkgnn_tpu.data.dataset import make_synthetic_dataset

    bs = int(os.environ.get("AB_BATCH", "256"))
    dtype = os.environ.get("AB_DTYPE") or None
    ds = make_synthetic_dataset(seed=0, num_graphs=4 * bs)

    arms = {}
    for name, balanced in [("cover", False), ("balanced", True)]:
        tr, blk = build(bs, balanced, ds, matmul_dtype=dtype)
        block = next(blk)
        state = tr.state
        state, loss = tr._train_steps_scan(state, tr._device_data, block)
        jax.block_until_ready(loss)
        arms[name] = dict(tr=tr, block=block, state=state)
        print(f"compiled {name}", flush=True)

    windows, reps = 8, 10  # 10 dispatches x 10 scan steps per window
    times = {k: [] for k in arms}
    for w in range(windows):
        for name, arm in arms.items():
            tr = arm["tr"]
            state = arm["state"]
            t0 = time.perf_counter()
            for _ in range(reps):
                state, loss = tr._train_steps_scan(
                    state, tr._device_data, arm["block"]
                )
            jax.block_until_ready(loss)
            dt = time.perf_counter() - t0
            arm["state"] = state
            times[name].append(1e3 * dt / (reps * 10))  # ms/step
        print(
            f"window {w}: "
            + " ".join(f"{k}={times[k][-1]:.3f}ms" for k in times),
            flush=True,
        )

    out = {
        k: {"min_ms_per_step": round(min(v), 4)} for k, v in times.items()
    }
    out["balanced_over_cover_min"] = round(
        out["balanced"]["min_ms_per_step"] / out["cover"]["min_ms_per_step"],
        3,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
