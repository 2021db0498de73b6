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
import threading
import time

import numpy as np

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
BENCH_STEPS = 240
BENCH_REPEATS = 2
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


def _measure_config(batch_size, matmul_dtype, ds, steps=BENCH_STEPS, balanced=False):
    """e2e scan-fused throughput for one (batch, dtype, spec) config.

    ``balanced=True`` uses the sampler-aware tight spec + size-dealt batch
    composition (graphs/balance.py): ~90% bucket occupancy vs ~55% for the
    cover spec — same math on the real rows, ~1.7x smaller padded shapes.
    """
    import jax

    from molkgnn_tpu.graphs import spec_for_dataset, spec_for_graphs
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

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
    trainer = Trainer(model, ds, spec, cfg)
    dev_data = trainer._device_data
    edge_counts = np.array([g.num_edges for g in ds.graphs])

    def id_blocks():
        stream = trainer._epoch_id_batches(cfg)
        while True:
            block = []
            while len(block) < SCAN_STEPS:
                try:
                    block.append(next(stream))
                except StopIteration:
                    stream = trainer._epoch_id_batches(cfg)
            yield np.stack(block)

    blocks = id_blocks()
    state = trainer.state
    state, loss_k = trainer._train_steps_scan(state, dev_data, next(blocks))
    jax.block_until_ready(loss_k)  # compile
    _tick()

    best = None
    for _ in range(BENCH_REPEATS):
        done = 0
        total_edges = 0
        t0 = time.perf_counter()
        while done < steps:
            block = next(blocks)
            total_edges += int(edge_counts[block[block >= 0]].sum())
            state, loss_k = trainer._train_steps_scan(state, dev_data, block)
            done += SCAN_STEPS
            _tick()
        jax.block_until_ready(loss_k)
        dt = time.perf_counter() - t0
        row = {
            "edges_per_s": round(total_edges / dt, 1),
            "step_ms": round(1e3 * dt / done, 3),
            "graphs_per_s": round(done * batch_size / dt, 1),
        }
        if best is None or row["edges_per_s"] > best["edges_per_s"]:
            best = row
    return best


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    from molkgnn_tpu.data.dataset import make_synthetic_dataset

    _tick()
    # Same dataset construction as round 1 for the headline row (spec
    # capacities derive from the graph pool, so pool size is part of the
    # config); a 4x pool for the batch-1024 rows.
    ds256 = make_synthetic_dataset(seed=0, num_graphs=4 * BATCH_SIZE)
    ds1024 = make_synthetic_dataset(seed=0, num_graphs=4 * 1024)
    flops_graph = _flops_per_graph(ds1024.graphs)

    # Headline: batch 256 fp32 cover spec (round-1 comparable).
    rows = {"b256_fp32": _measure_config(BATCH_SIZE, None, ds256)}
    _tick()
    # Compute-bound row: batch 1024, bf16 scoring matmuls (quality-neutral
    # on the motif learning task: tests/test_training.py bf16 parity).
    rows["b1024_bf16"] = _measure_config(1024, "bfloat16", ds1024)
    _tick()
    # Balanced rows: size-dealt batches on the tight sampler-aware spec
    # (graphs/balance.py, ~90% occupancy vs ~55%); identical math on real
    # rows (tests/test_balance.py parity + determinism).
    rows["b256_fp32_balanced"] = _measure_config(
        BATCH_SIZE, None, ds256, balanced=True
    )
    _tick()
    rows["b1024_bf16_balanced"] = _measure_config(
        1024, "bfloat16", ds1024, balanced=True
    )
    _tick()

    best_name = max(rows, key=lambda k: rows[k]["edges_per_s"])
    best = rows[best_name]
    mfu = best["graphs_per_s"] * flops_graph / PEAK_FLOPS_BF16
    r256 = rows["b256_fp32"]

    print(
        json.dumps(
            {
                "metric": "train_edges_per_s_molkgnn_4layer_b256_e2e",
                "value": r256["edges_per_s"],
                "unit": "edges/s",
                "vs_baseline": round(
                    r256["edges_per_s"] / BASELINE_EDGES_PER_S, 1
                ),
                "baseline": BASELINE_PROVENANCE,
                "e2e_step_ms": r256["step_ms"],
                "b1024_bf16_edges_per_s": rows["b1024_bf16"]["edges_per_s"],
                "b256_balanced_edges_per_s": rows["b256_fp32_balanced"][
                    "edges_per_s"
                ],
                "b1024_bf16_balanced_edges_per_s": rows[
                    "b1024_bf16_balanced"
                ]["edges_per_s"],
                "best_config": best_name,
                "best_edges_per_s": best["edges_per_s"],
                "best_vs_baseline": round(
                    best["edges_per_s"] / BASELINE_EDGES_PER_S, 1
                ),
                "mfu_best_bf16peak": round(mfu, 4),
                "matmul_flops_per_graph": round(flops_graph),
                "scan_steps": SCAN_STEPS,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
