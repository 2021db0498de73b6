"""Measure the propagate/aggregation path: XLA segment ops at bench shapes.

VERDICT r1 item 4 (second half): BASELINE.md names "Pallas SpMM/SDDMM and
segment-gather/scatter kernels over CSR" as candidate hot ops; round 1 used
plain XLA (`ops/segment.py`) without showing that is the right call. This
script measures, on the real TPU at flagship bench shapes:

  1. the isolated `gather_scatter_add` (the per-layer propagate,
     KernelLayer.py:119-123 contract) and `global_add_pool`;
  2. the full fwd+bwd+AdamW train step;
  3. a dense one-hot-matmul segment-sum (the classic MXU alternative a
     Pallas SpMM would approximate at these sizes).

The propagate's share of the step bounds any possible Pallas win. Results
are recorded in QUALITY.md; run with the default env (TPU):

  timeout 580 python benchmarks/bench_segment_ops.py
"""

import json
import time

import numpy as np


def _timeit_chained(fn, x, k=100, reps=5):
    """Per-op device time with dispatch amortized: ONE jitted lax.scan of
    ``k`` chained applications (each iteration consumes the previous
    output, so XLA cannot hoist or CSE the op)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(v):
        def body(c, _):
            out = fn(c)
            if out.shape == c.shape:
                nxt = out
            else:  # e.g. pooling: fold the result back to keep the chain
                nxt = c.at[: out.shape[0]].add(out)
            return nxt, None

        final, _ = lax.scan(body, v, None, length=k)
        return final

    out = loop(x)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * k) * 1e6  # us/op


def main():
    import jax
    import jax.numpy as jnp

    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.ops.segment import gather_scatter_add, global_add_pool
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    BS = 256
    ds = make_synthetic_dataset(seed=0, num_graphs=4 * BS)
    spec = spec_for_graphs(ds.graphs, batch_size=BS)
    batch = next(
        iter(GraphLoader(ds.subset("train"), spec, BS, drop_last=True))
    )
    batch = jax.tree.map(jnp.asarray, batch)

    C = 110  # sum of flagship kernel counts = propagate feature width
    n = batch.x.shape[0]
    e = batch.edge_src.shape[0]
    rng = np.random.default_rng(0)
    sc = jnp.asarray(rng.standard_normal((n, C)).astype(np.float32))

    prop = lambda v: gather_scatter_add(
        v, batch.edge_src, batch.edge_dst, num_nodes=n,
        edge_mask=batch.edge_mask,
    )
    pool = lambda v: global_add_pool(
        v, batch.node_graph_id, num_graphs=batch.num_graphs,
        node_mask=batch.node_mask,
    )

    # Dense one-hot segment-sum: h = onehot(dst)^T @ (sc[src] * mask) —
    # what a blocked Pallas SpMM would amount to at these sizes. The
    # one-hot is built inside the jit (a [E, N] fp32 constant would blow
    # the remote-compile upload limit).
    def dense_prop(v, dst, src, mask):
        onehot = jax.nn.one_hot(dst, n, dtype=jnp.float32) * (
            mask[:, None].astype(jnp.float32)
        )
        msgs = v[src]
        return jnp.einsum(
            "en,ec->nc", onehot, msgs, preferred_element_type=jnp.float32
        )

    dense_prop_j = lambda v: dense_prop(
        v, batch.edge_dst, batch.edge_src, batch.edge_mask
    )

    # full train step for the share computation
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=4, kernels_1hop=(10, 20, 30, 50),
            kernels_nhop=(10, 20, 30, 50), graph_embedding_dim=32,
            drop_ratio=0.2,
        ),
        ffn_dropout_rate=0.25,
    )
    cfg_scan = TrainConfig(
        batch_size=BS, max_epochs=1, warmup_iterations=300,
        weight_decay=1e-3, progress=False, scan_steps=10,
    )
    trainer = Trainer(model, ds, spec, cfg_scan)
    ids = np.stack([
        np.arange(i * BS, (i + 1) * BS, dtype=np.int32) % len(ds.graphs)
        for i in range(10)
    ])
    state, loss_k = trainer._train_steps_scan(
        trainer.state, trainer._device_data, ids
    )
    jax.block_until_ready(loss_k)
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss_k = trainer._train_steps_scan(
            state, trainer._device_data, ids
        )
    jax.block_until_ready(loss_k)
    step_us = (time.perf_counter() - t0) / 50 * 1e6  # per optimizer step

    us_scatter = _timeit_chained(prop, sc)
    us_pool = _timeit_chained(pool, sc)
    us_dense = _timeit_chained(dense_prop_j, sc)

    # In-model ablation (attempted): replacing the propagate with identity
    # does NOT yield its cost — it makes the step ~135x SLOWER (20.5 ms vs
    # 0.15 ms), because the scatter is a fusion barrier XLA builds its
    # schedule around; without it the backward re-fuses pathologically.
    # So the honest bound is a roofline: the aggregation path moves a
    # fixed number of bytes, and the measured step already sits near the
    # sum of that bandwidth cost and the MXU time of the scoring matmuls.
    HBM_GBPS = 819e9  # v5e
    bytes_per_prop = (e * C + 2 * n * C + e * C) * 4  # gather rd+wr, scatter rd+wr
    bytes_pool = (n * C + 2 * BS * C) * 4
    # fwd: gather+scatter; bwd: the scatter's gradient is a gather and
    # the gather's gradient a scatter -> ~2x the forward bytes total
    agg_bytes_step = 2 * (4 * bytes_per_prop) + bytes_pool
    bw_floor_us = agg_bytes_step / HBM_GBPS * 1e6

    prop_share = None  # see note
    out = {
        "shapes": {"nodes": int(n), "edges": int(e), "C": C, "batch": BS},
        "xla_gather_scatter_add_us": round(us_scatter, 1),
        "xla_global_add_pool_us": round(us_pool, 1),
        "dense_onehot_matmul_us": round(us_dense, 1),
        "full_train_step_us": round(step_us, 1),
        "aggregation_bandwidth_floor_us": round(bw_floor_us, 1),
        "device": str(jax.devices()[0]),
        "note": (
            "verdict: the fused step (0.15-0.55 ms; tunnel-state "
            "variance) is comparable to the "
            "aggregation path's pure HBM-bandwidth floor plus the scoring "
            "matmuls' MXU time — no headroom for a Pallas segment kernel "
            "at these shapes. Ablating the scatter is not a valid cost "
            "probe: it is a fusion barrier, and removing it makes the "
            "step ~135x slower (measured 20.5 ms). Isolated op timings "
            "above run outside the model's fusion context and overstate "
            "in-situ cost (they exceed the whole step)."
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
