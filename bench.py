"""Benchmark: MolKGNN end-to-end training throughput (edges/s) on the local
accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N, ...}

Setup mirrors the reference's flagship model (4 layers, 10/20/30/50 kernels
per degree, hidden 32 — Supplement Table 3 / MolKGNNNet.py:162-174) on
synthetic molecules with AID-like sizes, batch 256 molecules. The measured
quantity is END-TO-END training throughput: real (unpadded) edges consumed
per wall-clock second of the full loop — host batch assembly (flat-packed
gather loader), prefetch/H2D staging, and the jitted train step (forward +
backward + AdamW). A pure device step time is reported alongside.

vs_baseline: the reference publishes no throughput (BASELINE.md). The bar is
an estimated PyG-on-GPU rate for the same config, dominated by the
reference's per-node Python chirality loop and per-degree kernel loops
(kernels.py:279-350): ~60 ms/step at batch 16 with ~1.4k edges/batch
=> ~2.3e4 edges/s. Recorded in BASELINE_EDGES_PER_S until a real measurement
of the PyTorch reference replaces it.
"""

import json
import os
import threading
import time

import numpy as np

BASELINE_EDGES_PER_S = 2.3e4

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
BENCH_STEPS = 60
WARMUP_STEPS = 5
# Optimizer steps fused per device dispatch (lax.scan over sampled-id
# blocks, trainer.scan_steps). The per-dispatch launch latency over the
# tunneled link is the dominant e2e overhead at this batch size; fusing
# amortizes it across SCAN_STEPS steps with identical math (parity test:
# tests/test_training.py::test_scan_steps_match_single_steps).
SCAN_STEPS = 10


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.data.prefetch import prefetch_to_device
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    _tick()
    ds = make_synthetic_dataset(seed=0, num_graphs=4 * BATCH_SIZE)
    spec = spec_for_graphs(ds.graphs, batch_size=BATCH_SIZE)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=4,
            kernels_1hop=(10, 20, 30, 50),
            kernels_nhop=(10, 20, 30, 50),
            graph_embedding_dim=32,
            drop_ratio=0.2,
        ),
        ffn_dropout_rate=0.25,
    )
    cfg = TrainConfig(
        batch_size=BATCH_SIZE,
        max_epochs=1,
        warmup_iterations=300,
        weight_decay=1e-3,
        progress=False,
        scan_steps=SCAN_STEPS,
    )
    trainer = Trainer(model, ds, spec, cfg)

    def loader():
        return GraphLoader(
            ds.subset("train"),
            spec,
            BATCH_SIZE,
            oversample=True,
            seed=0,
            drop_last=True,
        )

    base_loader = loader()

    def endless():
        while True:
            yield from prefetch_to_device(base_loader)

    stream = endless()

    # Warmup (compile + caches).
    state = trainer.state
    _tick()
    for _ in range(WARMUP_STEPS):
        state, loss = trainer._train_step(state, next(stream))
    jax.block_until_ready(loss)
    _tick()

    # Device-only step time (pre-staged batch).
    staged = jax.tree.map(jax.numpy.asarray, next(stream))
    t0 = time.perf_counter()
    for _ in range(20):
        state, loss = trainer._train_step(state, staged)
    jax.block_until_ready(loss)
    dev_step_ms = (time.perf_counter() - t0) / 20 * 1e3

    # End-to-end (device-resident dataset): per-DISPATCH host work is
    # sampling a [K, B] id block; batch assembly happens on device
    # (device_pack.py) and lax.scan fuses K optimizer steps per dispatch.
    # Edge counts come from host-side metadata, not device readbacks.
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
    block0 = next(blocks)
    state, loss_k = trainer._train_steps_scan(state, dev_data, block0)
    jax.block_until_ready(loss_k)  # compile
    _tick()

    steps = 0
    total_edges = 0
    t0 = time.perf_counter()
    while steps < BENCH_STEPS:
        block = next(blocks)
        total_edges += int(edge_counts[block[block >= 0]].sum())
        state, loss_k = trainer._train_steps_scan(state, dev_data, block)
        steps += SCAN_STEPS
        _tick()
    jax.block_until_ready(loss_k)
    dt = time.perf_counter() - t0

    edges_per_s = total_edges / dt
    print(
        json.dumps(
            {
                "metric": "train_edges_per_s_molkgnn_4layer_b256_e2e",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
                "e2e_step_ms": round(1e3 * dt / BENCH_STEPS, 2),
                "device_step_ms": round(dev_step_ms, 2),
                "scan_steps": SCAN_STEPS,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
