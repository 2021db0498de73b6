"""One-shot exploitation of a HEALTHY link window (VERDICT r3 items 1/7).

Every r4 TPU window was in the relay's stable degraded state
(readback RTT 30-44 ms; benchmarks/DIAG_TRAINSTEP.json), so the three
outstanding healthy-link measurements are packaged here to fire the
moment a healthy window appears (this round, the driver's end-of-round
run, or round 5):

  1. bench.py rows (b256/b1024/b1024-devsample/b8192) — the artifact of
     record, via `python bench.py`;
  2. the healthy device-sampling delta at b1024 (devsample vs host-id
     rows are interleaved inside bench.py already — the JSON carries
     both);
  3. the b1024 residual analysis (VERDICT r3 item 7): per-dispatch device
     step time at scan K in {1, 10, 80} from bench._Runner windows, so
     the dispatch-vs-compute split at the tracked headline is explicit.

Refuses to run (exit 3) when the link is degraded: readback RTT > 5 ms
— measuring there characterizes the link (CLAUDE.md). Run:

    timeout 1800 python benchmarks/healthy_window.py

Writes benchmarks/HEALTHY_WINDOW.json on success.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def link_rtt_ms():
    import jax
    import jax.numpy as jnp

    f0 = jax.jit(lambda a: a + 1)
    x = jnp.float32(0.0)
    float(f0(x))
    t = time.perf_counter()
    for _ in range(5):
        float(f0(x))
    return (time.perf_counter() - t) / 5 * 1000


def main():
    rtt = link_rtt_ms()
    print(f"[healthy_window] readback RTT {rtt:.2f} ms", flush=True)
    if rtt > 5.0:
        print(
            "[healthy_window] link degraded (RTT > 5 ms) — refusing; rates"
            " measured now would characterize the link, not the code"
            " (benchmarks/DIAG_TRAINSTEP.json).",
            flush=True,
        )
        return 3

    out = {"link_rtt_ms": round(rtt, 2)}

    # 1+2. The bench rows (in a fresh process: bench.py owns its watchdog
    # and budget; its JSON line carries devsample + host-id twins).
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=660,
    )
    try:
        out["bench"] = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        out["bench_error"] = r.stdout[-1000:] + r.stderr[-500:]

    # 3. b1024 scan-K ladder: the per-dispatch split at the headline.
    sys.path.insert(0, REPO)
    import bench as B
    from molkgnn_tpu.data.dataset import make_synthetic_dataset

    ds = make_synthetic_dataset(seed=0, num_graphs=4 * 1024)
    ladder = {}
    for k in (1, 10, 80):
        B.SCAN_STEPS = k
        runner = B._Runner(1024, "bfloat16", ds, device_sample=True)
        row = runner.measure(steps=max(80, k), repeats=2)
        ladder[f"scan{k}"] = {
            "edges_per_s": row["edges_per_s"],
            "step_ms": row["step_ms"],
        }
        del runner
    out["b1024_scan_ladder"] = ladder

    with open(os.path.join(HERE, "HEALTHY_WINDOW.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
