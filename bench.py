"""Benchmark: MolKGNN training throughput (edges/s) on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N, ...}

Setup mirrors the reference's flagship config (4 layers, 10/20/30/50 kernels
per degree, hidden 32 — Supplement Table 3 / MolKGNNNet.py:162-174) on
synthetic molecules with AID-like sizes. The measured quantity is steady-state
*training* throughput: real (unpadded) edges processed per second of the
jitted train step (forward + backward + AdamW), host batching excluded.

vs_baseline: the reference publishes no throughput (BASELINE.md). The bar is
an estimated PyG-on-GPU rate for the same config, dominated by the
reference's per-node Python chirality loop and per-degree kernel loops
(kernels.py:279-350): ~60 ms/step at batch 16 with ~1.4k edges/batch
=> ~2.3e4 edges/s. Recorded in BASELINE_EDGES_PER_S until a real measurement
of the PyTorch reference replaces it.
"""

import json
import time

import numpy as np

BASELINE_EDGES_PER_S = 2.3e4

BATCH_SIZE = 64  # molecules per step (per chip)
NUM_STEPS = 30
WARMUP_STEPS = 5


def main():
    import jax

    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

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
    )
    trainer = Trainer(model, ds, spec, cfg)

    loader = GraphLoader(
        ds.subset("train"), spec, BATCH_SIZE, oversample=True, seed=0
    )
    batches = list(loader)[:4]
    edges_per_batch = [int(np.asarray(b.edge_mask).sum()) for b in batches]

    state = trainer.state
    for i in range(WARMUP_STEPS):
        state, loss = trainer._train_step(state, batches[i % len(batches)])
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    total_edges = 0
    for i in range(NUM_STEPS):
        b = batches[i % len(batches)]
        state, loss = trainer._train_step(state, b)
        total_edges += edges_per_batch[i % len(batches)]
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    edges_per_s = total_edges / dt
    print(
        json.dumps(
            {
                "metric": "train_edges_per_s_molkgnn_4layer_b64",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
                "step_ms": round(1e3 * dt / NUM_STEPS, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
