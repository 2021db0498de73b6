"""A/B: whole-split scanned evaluation vs per-batch eval dispatches.

r4 moved Trainer._predict_ids from one compiled dispatch per eval batch
to ONE dispatch scanning the split's [nblocks, B] id matrix
(trainer._build_eval_steps_scan). This measures both strategies on the
real TPU over the same split, params, and compiled-batch shapes:
interleaved windows, value-readback-honest timing (readiness lies on the
degraded relay — CLAUDE.md).

Writes benchmarks/EVAL_SCAN_AB.json.
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BATCH = 256
N_EVAL = 4096  # 16 batches per epoch-equivalent eval pass
WINDOWS = 3


def main():
    import jax
    import jax.numpy as jnp

    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.graphs.device_pack import pad_ids
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    out = {"batch": BATCH, "n_eval": N_EVAL, "windows": WINDOWS}
    x = jnp.float32(0.0)
    f0 = jax.jit(lambda a: a + 1)
    float(f0(x))
    t = time.perf_counter()
    for _ in range(5):
        float(f0(x))
    out["link_rtt_ms"] = round((time.perf_counter() - t) / 5 * 1000, 2)

    ds = make_synthetic_dataset(seed=0, num_graphs=N_EVAL)
    spec = spec_for_graphs(ds.graphs, batch_size=BATCH)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=4,
            kernels_1hop=(10, 20, 30, 50),
            kernels_nhop=(10, 20, 30, 50),
            graph_embedding_dim=32,
            matmul_dtype="bfloat16",
        ),
        ffn_dropout_rate=0.25,
    )
    cfg = TrainConfig(
        batch_size=BATCH, max_epochs=1, warmup_iterations=10, progress=False
    )
    trainer = Trainer(model, ds, spec, cfg)
    data = trainer._device_data
    params, stats = trainer.state.params, trainer.state.batch_stats

    ids = np.arange(N_EVAL, dtype=np.int32)
    idm = np.stack(
        [pad_ids(ids[s : s + BATCH], BATCH) for s in range(0, N_EVAL, BATCH)]
    )

    # Compile both once, first-readback untimed.
    t0 = time.time()
    per_batch = trainer._eval_step_ids
    v = per_batch(params, stats, data, jnp.asarray(idm[0]))
    float(np.asarray(v).ravel()[0])
    out["per_batch_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    scanned = trainer._eval_steps_scan
    v = scanned(params, stats, data, jnp.asarray(idm))
    float(np.asarray(v).ravel()[0])
    out["scan_compile_s"] = round(time.time() - t0, 1)

    a_times, b_times = [], []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        preds = [
            per_batch(params, stats, data, jnp.asarray(row)) for row in idm
        ]
        flat_a = np.asarray(jnp.concatenate(preds))
        a_times.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        flat_b = np.asarray(scanned(params, stats, data, jnp.asarray(idm)))
        b_times.append(time.perf_counter() - t0)
    np.testing.assert_allclose(
        flat_a.reshape(-1), flat_b.reshape(-1), rtol=0, atol=0
    )  # identical math, identical results
    out["per_batch_eval_s"] = [round(t, 3) for t in a_times]
    out["scanned_eval_s"] = [round(t, 3) for t in b_times]
    out["speedup_best"] = round(min(a_times) / min(b_times), 2)
    out["dispatches"] = {"per_batch": len(idm), "scanned": 1}
    out["device"] = str(jax.devices()[0])
    with open(os.path.join(HERE, "EVAL_SCAN_AB.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
