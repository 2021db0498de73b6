"""Full fit() on the real TPU through the CLI (VERDICT r3 item 3).

bench.py drives isolated fused train-step programs; this drill runs the
REAL system path on hardware for the first time: `molkgnn` CLI ->
Trainer.fit() epoch loop (device-sampled, scan-fused), per-epoch
evaluation readbacks, checkpoint tracking, test() — the paths whose
readback discipline (one loss readback per epoch, ids-only eval
dispatch) was designed for this link. The per-epoch wall-time breakdown
(train dispatch vs readback vs eval) lands in history.json and is copied
into the artifact.

Flagship config on the synthetic_motif task (no real SDF is mounted;
motif labels are learnable so the AUC curve is real training evidence):
4 layers, kernels 10/20/30/50, hidden 32, dropout on, batch 256,
oversampling + device sampling, scan_steps=40.

Safety: the axon relay wedges if a TPU process dies mid-grant
(CLAUDE.md), so the CLI child gets a generous timeout and we NEVER kill
it by pattern; a link RTT probe runs in the SAME child before training
(molkgnn itself is the only TPU process). Always writes
benchmarks/TPU_FIT.json, including on failure.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
RUN_DIR = "/tmp/tpu_fit_drill"
TIMEOUT_S = 3300


def main():
    import shutil

    if os.path.isdir(RUN_DIR):  # stale logs/history must not leak in
        shutil.rmtree(RUN_DIR)
    out = {"config": "motif-4096, 4 layers 10/20/30/50, b256, devsample, scan40, warmup40, 6 epochs"}
    t0 = time.time()
    r = None
    try:
        r = subprocess.run(
            [
                "molkgnn",
                "--dataset_name", "synthetic_motif",
                "--synthetic_graphs", "4096",
                "--num_layers", "4",
                "--hidden_dim", "32",
                "--batch_size", "256",
                "--max_epochs", "6",
                "--warmup_iterations", "40",  # 13 steps/epoch * 6 epochs: flagship's
                # warmup=300 would swallow the whole run inside warmup
                "--peak_lr", "5e-3",
                "--enable_oversampling_with_replacement",
                "--device_sampling",
                "--scan_steps", "40",
                "--train_metric",
                "--default_root_dir", RUN_DIR,
            ],
            capture_output=True,
            text=True,
            timeout=TIMEOUT_S,
        )
        out["returncode"] = r.returncode
        if r.returncode != 0:
            out["stderr_tail"] = r.stderr[-2000:]
    except subprocess.TimeoutExpired:
        out["returncode"] = -1
        out["error"] = f"CLI run exceeded {TIMEOUT_S}s (link wedged/degraded?)"
    out["wall_s"] = round(time.time() - t0, 1)

    hist_path = os.path.join(RUN_DIR, "logs", "history.json")
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
        out["epochs"] = len(hist)
        out["history"] = [
            {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in e.items()
            }
            for e in hist
        ]
        out["final_AUC"] = hist[-1].get("AUC")
        out["final_logAUC"] = hist[-1].get("logAUC_0.001_0.1")
        out["timing_breakdown_last_epoch"] = {
            k: round(hist[-1].get(k, float("nan")), 2)
            for k in (
                "epoch_time_s",
                "train_dispatch_time_s",
                "train_readback_time_s",
                "eval_time_s",
            )
        }
    tr_path = os.path.join(RUN_DIR, "logs", "test_result.log")
    out["test_result_exists"] = os.path.exists(tr_path)
    if out["test_result_exists"]:
        with open(tr_path) as f:
            out["test_result_tail"] = f.read()[-800:]
    if r is not None:
        # The CLI prints total run time (reference entry.py:384-393).
        out["stdout_tail"] = r.stdout[-800:]

    path = os.path.join(HERE, "TPU_FIT.json")
    payload = out
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if "summary" in prev:
            # r4 composite artifact (run1/run2 records): append this rerun
            # as its own keyed record instead of clobbering the history
            # (VERDICT r4 weak #5: run2's test() was cut off by the outer
            # harness cap — this rerun completes the end-to-end artifact).
            prev["run2_complete_r5"] = out
            payload = prev
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    sys.exit(main())
