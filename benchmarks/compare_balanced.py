"""Interleaved A/B: cover-spec vs balanced tight-spec train step.

bench.py measures configs sequentially; the tunneled link's latency drifts
on a minutes scale, which confounded cross-config comparisons (the same
pair showed +51% one run and -24% the next). Here both compiled programs
are measured in ALTERNATING short windows so they sample identical tunnel
states; per-config the minimum window time (max rate) is the program's own
sustained rate, and the per-window ratio stream shows the drift directly.

Run on the TPU: timeout 1200 python -u benchmarks/compare_balanced.py
"""

import json
import time

import numpy as np


def build(batch_size, balanced, ds, matmul_dtype=None, scan_steps=10):
    from molkgnn_tpu.graphs import spec_for_dataset, spec_for_graphs
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    spec = (
        spec_for_dataset(ds, batch_size)
        if balanced
        else spec_for_graphs(ds.graphs, batch_size=batch_size)
    )
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=4,
            kernels_1hop=(10, 20, 30, 50),
            kernels_nhop=(10, 20, 30, 50),
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
        progress=False,
        scan_steps=scan_steps,
        balanced_batches=balanced,
    )
    tr = Trainer(model, ds, spec, cfg)

    def stream():
        while True:
            yield from tr._epoch_id_batches(cfg)

    s = stream()

    def blocks():
        while True:
            yield np.stack([next(s) for _ in range(scan_steps)])

    return tr, blocks()


def main():
    import jax

    from molkgnn_tpu.data.dataset import make_synthetic_dataset

    bs = int(__import__("os").environ.get("AB_BATCH", "256"))
    dtype = __import__("os").environ.get("AB_DTYPE") or None
    ds = make_synthetic_dataset(seed=0, num_graphs=4 * bs)
    edge_counts = np.array([g.num_edges for g in ds.graphs])

    arms = {}
    for name, balanced in [("cover", False), ("balanced", True)]:
        tr, blk = build(bs, balanced, ds, matmul_dtype=dtype)
        state = tr.state
        state, loss = tr._train_steps_scan(state, tr._device_data, next(blk))
        jax.block_until_ready(loss)  # compile
        arms[name] = dict(tr=tr, blk=blk, state=state)
        print(f"compiled {name} (bs={bs} dtype={dtype})", flush=True)

    windows = 10
    dispatches_per_window = 8  # 80 steps per window
    rates = {k: [] for k in arms}
    for w in range(windows):
        for name, arm in arms.items():
            tr, blk = arm["tr"], arm["blk"]
            state = arm["state"]
            edges = 0
            t0 = time.perf_counter()
            for _ in range(dispatches_per_window):
                block = next(blk)
                edges += int(edge_counts[block[block >= 0]].sum())
                state, loss = tr._train_steps_scan(
                    state, tr._device_data, block
                )
            jax.block_until_ready(loss)
            dt = time.perf_counter() - t0
            arm["state"] = state
            rates[name].append(edges / dt)
        print(
            f"window {w}: "
            + " ".join(f"{k}={rates[k][-1]/1e6:.1f}M" for k in rates),
            flush=True,
        )

    out = {
        k: {
            "best_edges_per_s": round(max(v), 1),
            "median_edges_per_s": round(float(np.median(v)), 1),
        }
        for k, v in rates.items()
    }
    out["balanced_over_cover_best"] = round(
        out["balanced"]["best_edges_per_s"]
        / out["cover"]["best_edges_per_s"],
        3,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
