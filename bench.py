"""Benchmark: MolKGNN end-to-end training throughput (edges/s) on the local
accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N, ...}

Setup mirrors the reference's flagship model (4 layers, 10/20/30/50 kernels
per degree, hidden 32 — Supplement Table 3 / MolKGNNNet.py:162-174) on
synthetic molecules with AID-like sizes. The headline number is END-TO-END
training throughput at batch 256: real (unpadded) edges consumed per
wall-clock second of the full loop — id-block sampling on host, on-device
batch assembly from the device-resident dataset, and lax.scan-fused
optimizer steps (forward + backward + AdamW). Additional rows report the
compute-bound configs (batch 1024, bfloat16 scoring matmuls) and an
analytic MFU estimate.

vs_baseline: MEASURED. benchmarks/measure_baseline.py runs the reference's
own kernels.py (imported unmodified, torch-CPU) inside a faithful replica
of its training step on the same synthetic molecules: 936.6 edges/s at its
flagship batch 16 (its best config; 119 edges/s at batch 256 — the
per-node Python chirality loop dominates, kernels.py:279-350). That is the
measured-CPU bar; the reference's GPU rate remains unmeasured (no GPU in
any environment seen so far, BASELINE.md). Same-hardware comparison for
calibration: our jax-CPU backend does 63.0k edges/s at batch 16 on the
same 2-core box — 67x the reference before any TPU enters the picture.
"""

import json
import os
import sys
import threading
import time

import numpy as np

_T0 = time.time()

# Measured: benchmarks/BASELINE_MEASURED.json (reference torch-CPU, its
# flagship batch 16, 2 threads — the faster of its two measured configs).
BASELINE_EDGES_PER_S = 936.6
BASELINE_PROVENANCE = "measured torch-CPU b16 (benchmarks/BASELINE_MEASURED.json); reference GPU unmeasured"

# TPU v5e peak: 197 TFLOP/s bf16 (fp32 matmuls decompose on the MXU, so
# bf16 peak is the honest denominator for both dtypes).
PEAK_FLOPS_BF16 = 197e12

# Watchdog: the dev environment reaches the TPU through a relay that can
# wedge if a previous process died holding the grant; a hung device op
# cannot be interrupted in-process. If the bench makes no progress for
# WATCHDOG_S seconds, emit a diagnostic line and hard-exit instead of
# hanging the driver.
WATCHDOG_S = 480
_progress = {"t": time.time()}


def _tick():
    _progress["t"] = time.time()


def _watchdog():
    while True:
        time.sleep(15)
        if time.time() - _progress["t"] > WATCHDOG_S:
            print(
                json.dumps(
                    {
                        "metric": "train_edges_per_s_molkgnn_4layer_b256_e2e",
                        "value": 0,
                        "unit": "edges/s",
                        "vs_baseline": 0,
                        "error": "accelerator unresponsive (relay wedged?)",
                    }
                ),
                flush=True,
            )
            os._exit(1)


BATCH_SIZE = 256
# Steps per timed repeat, and repeats per config (max kept). The tunneled
# link's latency drifts minute-to-minute (measured spread up to ~2x on
# identical programs), so a single short window is noise-dominated; longer
# windows + best-of-R isolates the program's own rate.
BENCH_STEPS = 160
BENCH_REPEATS = 2
# Wall-clock budget: the driver runs this file under a ~10 min timeout; a
# killed TPU process can wedge the single-tenant grant for every later
# process (CLAUDE.md), so the bench must ALWAYS print its JSON line and
# exit on its own. The headline row always runs; optional rows are skipped
# once the budget is spent (remote compiles are the dominant cost, 20-40s
# per program).
TOTAL_BUDGET_S = 420
# Optimizer steps fused per device dispatch (lax.scan over sampled-id
# blocks, trainer.scan_steps). The per-dispatch launch latency over the
# tunneled link is the dominant e2e overhead; fusing amortizes it across
# SCAN_STEPS steps with identical math (parity test:
# tests/test_training.py::test_scan_steps_match_single_steps).
SCAN_STEPS = 10

PERMS = {1: 1, 2: 2, 3: 6, 4: 12}
KERNELS = (10, 20, 30, 50)
NUM_LAYERS = 4
EDGE_DIM = 7
NODE_DIM = 28


def _flops_per_graph(graphs):
    """Analytic matmul FLOPs per molecule for one fwd+bwd train step
    (backward ~= 2x forward for the scoring matmuls; head/BN negligible)."""
    deg_counts = np.zeros(5)
    for g in graphs:
        for d in range(1, 5):
            deg_counts[d] += g.fields[d].count
    deg_counts /= len(graphs)
    fwd = 0.0
    for layer in range(NUM_LAYERS):
        f_in = NODE_DIM if layer == 0 else sum(KERNELS)
        for d in range(1, 5):
            n_d, l_d, p_d = deg_counts[d], KERNELS[d - 1], PERMS[d]
            fwd += 2 * n_d * (d * f_in) * (l_d * p_d)  # support scoring
            fwd += 2 * n_d * (d * EDGE_DIM) * (l_d * p_d)  # edge scoring
            fwd += 2 * n_d * f_in * l_d  # center scoring
    return 3.0 * fwd  # fwd + bwd


def _log(msg):
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


class _Runner:
    """One (batch, dtype, spec) config: built once (device transfer +
    compile), measurable in repeated windows. Keeping runners alive lets the
    main loop interleave windows across wall-clock time — the tunneled
    link's latency drifts minute-to-minute (up to ~2x), so the max over
    time-separated windows isolates the program's own rate.

    ``balanced=True`` uses the sampler-aware tight spec + size-dealt batch
    composition (graphs/balance.py): ~90% bucket occupancy vs ~55% for the
    cover spec — same math on the real rows, ~1.7x smaller padded shapes.
    """

    def __init__(self, batch_size, matmul_dtype, ds, balanced=False):
        import jax

        from molkgnn_tpu.graphs import spec_for_dataset, spec_for_graphs
        from molkgnn_tpu.models import MolKGNNNet
        from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

        self.batch_size = batch_size
        self._jax = jax
        if balanced:
            spec = spec_for_dataset(ds, batch_size)
        else:
            spec = spec_for_graphs(ds.graphs, batch_size=batch_size)
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=NUM_LAYERS,
                kernels_1hop=KERNELS,
                kernels_nhop=KERNELS,
                graph_embedding_dim=32,
                drop_ratio=0.2,
                matmul_dtype=matmul_dtype,
            ),
            ffn_dropout_rate=0.25,
        )
        cfg = TrainConfig(
            batch_size=batch_size,
            max_epochs=1,
            warmup_iterations=300,
            weight_decay=1e-3,
            progress=False,
            scan_steps=SCAN_STEPS,
            balanced_batches=balanced,
        )
        t0 = time.time()
        self.trainer = Trainer(model, ds, spec, cfg)
        self.dev_data = self.trainer._device_data
        self.edge_counts = np.array([g.num_edges for g in ds.graphs])
        _log(f"b{batch_size} setup (incl. device transfer) {time.time()-t0:.0f}s")

        def id_blocks():
            stream = self.trainer._epoch_id_batches(cfg)
            while True:
                block = []
                while len(block) < SCAN_STEPS:
                    try:
                        block.append(next(stream))
                    except StopIteration:
                        stream = self.trainer._epoch_id_batches(cfg)
                yield np.stack(block)

        self.blocks = id_blocks()
        self.state = self.trainer.state
        t0 = time.time()
        self.state, loss_k = self.trainer._train_steps_scan(
            self.state, self.dev_data, next(self.blocks)
        )
        jax.block_until_ready(loss_k)  # compile
        _log(f"b{batch_size} compile {time.time()-t0:.0f}s")
        _tick()
        self.best = None

    def measure(self, steps=BENCH_STEPS, repeats=BENCH_REPEATS):
        """Run timed windows; keep the best across ALL calls (time-spread)."""
        for _ in range(repeats):
            done = 0
            total_edges = 0
            t0 = time.perf_counter()
            while done < steps:
                block = next(self.blocks)
                total_edges += int(
                    self.edge_counts[block[block >= 0]].sum()
                )
                self.state, loss_k = self.trainer._train_steps_scan(
                    self.state, self.dev_data, block
                )
                done += SCAN_STEPS
                _tick()
            self._jax.block_until_ready(loss_k)
            dt = time.perf_counter() - t0
            row = {
                "edges_per_s": round(total_edges / dt, 1),
                "step_ms": round(1e3 * dt / done, 3),
                "graphs_per_s": round(done * self.batch_size / dt, 1),
            }
            if self.best is None or row["edges_per_s"] > self.best["edges_per_s"]:
                self.best = row
        _log(
            f"b{self.batch_size} window: best {self.best['edges_per_s']:.3g} edges/s"
        )
        return self.best


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    t_start = _T0
    import jax

    from molkgnn_tpu.data.dataset import make_synthetic_dataset

    _tick()
    # Same dataset construction as round 1 for the headline row (spec
    # capacities derive from the graph pool, so pool size is part of the
    # config).
    ds256 = make_synthetic_dataset(seed=0, num_graphs=4 * BATCH_SIZE)

    # Headline: batch 256 fp32 cover spec (round-1 comparable). Always runs
    # first AND re-measures in a late window below (tunnel-drift defense).
    headline = _Runner(BATCH_SIZE, None, ds256)
    rows = {"b256_fp32": headline.measure()}
    skipped = []

    def budget_left():
        return TOTAL_BUDGET_S - (time.time() - t_start)

    # Optional rows, best-first; each is skipped (and reported as skipped)
    # if the remaining budget cannot cover its setup + compile + windows.
    ds1024 = None
    flops_graph = _flops_per_graph(ds256.graphs)
    for name, need_s, cfg in [
        # Compute-bound row: batch 1024, bf16 scoring matmuls (quality-
        # neutral: tests/test_training.py bf16 parity).
        ("b1024_bf16", 150, dict(bs=1024, dtype="bfloat16", balanced=False)),
        # Balanced: size-dealt batches on the tight sampler-aware spec
        # (graphs/balance.py, ~90% occupancy; identical math on real rows).
        (
            "b1024_bf16_balanced",
            150,
            dict(bs=1024, dtype="bfloat16", balanced=True),
        ),
        (
            "b256_fp32_balanced",
            120,
            dict(bs=256, dtype=None, balanced=True),
        ),
    ]:
        if budget_left() < need_s:
            skipped.append(name)
            continue
        if cfg["bs"] == 1024 and ds1024 is None:
            ds1024 = make_synthetic_dataset(seed=0, num_graphs=4 * 1024)
            flops_graph = _flops_per_graph(ds1024.graphs)
        ds = ds1024 if cfg["bs"] == 1024 else ds256
        runner = _Runner(cfg["bs"], cfg["dtype"], ds, balanced=cfg["balanced"])
        rows[name] = runner.measure()
        # Interleave a late headline window after each optional config
        # (already compiled — costs ~2s) so the reported headline is the
        # max over time-separated windows, not one tunnel-latency draw.
        rows["b256_fp32"] = headline.measure(repeats=1)
        _tick()

    best_name = max(rows, key=lambda k: rows[k]["edges_per_s"])
    best = rows[best_name]
    mfu = best["graphs_per_s"] * flops_graph / PEAK_FLOPS_BF16
    r256 = rows["b256_fp32"]

    out = {
        "metric": "train_edges_per_s_molkgnn_4layer_b256_e2e",
        "value": r256["edges_per_s"],
        "unit": "edges/s",
        "vs_baseline": round(r256["edges_per_s"] / BASELINE_EDGES_PER_S, 1),
        "baseline": BASELINE_PROVENANCE,
        "e2e_step_ms": r256["step_ms"],
        "best_config": best_name,
        "best_edges_per_s": best["edges_per_s"],
        "best_vs_baseline": round(
            best["edges_per_s"] / BASELINE_EDGES_PER_S, 1
        ),
        "mfu_best_bf16peak": round(mfu, 4),
        "matmul_flops_per_graph": round(flops_graph),
        "scan_steps": SCAN_STEPS,
        "wall_s": round(time.time() - t_start, 1),
        "device": str(jax.devices()[0]),
    }
    for name, row in rows.items():
        if name != "b256_fp32":
            out[f"{name}_edges_per_s"] = row["edges_per_s"]
    if skipped:
        out["skipped_rows"] = skipped
    print(json.dumps(out))


if __name__ == "__main__":
    main()
