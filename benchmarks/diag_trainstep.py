"""Bisect WHICH stage of the fused train step is slow on a degraded link.

Motivation (r4): in the relay's stable degraded state the full scan-fused
train step ran ~250x slow (84 ms/step at b1024 vs ~0.3 ms healthy), yet
isolated probes measured the MXU at full speed (136 TF/s bf16 chained
matmuls), HBM at ~620 GB/s, gathers/segment-sums at rate, and per-op
overhead ~1.5 us — so the slowdown lives somewhere specific. This bench
compiles a LADDER of sub-programs of the real training computation, each
scanned K times with a value readback ending the window (readiness lies
in this state; only value fetches are honest), so the deltas between
rungs isolate the slow stage:

  1. sample+gather only     (alias draw + gather_batch, result summed)
  2. + encoder forward      (eval-mode apply)
  3. + loss + backward      (value_and_grad, grads summed)
  4. full optimizer step    (trainer._train_steps_sample — the real thing)

Writes benchmarks/DIAG_TRAINSTEP.json. Never dies without emitting: every
rung is fault-isolated.
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
K = int(os.environ.get("DIAG_K", "20"))
BATCH = int(os.environ.get("DIAG_BATCH", "1024"))


def main():
    import jax
    import jax.numpy as jnp

    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.graphs.device_pack import gather_batch, sample_ids
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    out = {"batch": BATCH, "scan_k": K}

    # Link RTT (value readback — the honest probe).
    x = jnp.float32(0.0)
    f0 = jax.jit(lambda a: a + 1)
    float(f0(x))
    t = time.perf_counter()
    for _ in range(5):
        float(f0(x))
    out["link_rtt_ms"] = round((time.perf_counter() - t) / 5 * 1000, 2)

    ds = make_synthetic_dataset(seed=0, num_graphs=4 * BATCH)
    spec = spec_for_graphs(ds.graphs, batch_size=BATCH)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=4,
            kernels_1hop=(10, 20, 30, 50),
            kernels_nhop=(10, 20, 30, 50),
            graph_embedding_dim=32,
            drop_ratio=0.2,
            matmul_dtype="bfloat16",
        ),
        ffn_dropout_rate=0.25,
    )
    cfg = TrainConfig(
        batch_size=BATCH, max_epochs=1, warmup_iterations=300,
        progress=False, scan_steps=K, device_sampling=True,
    )
    trainer = Trainer(model, ds, spec, cfg)
    data = trainer._device_data
    tids, table = trainer._sample_consts
    state = trainer.state
    salt = trainer._SAMPLE_SALT

    def timed(tag, build):
        try:
            prog, args = build()
            t0 = time.time()
            v = prog(*args)
            jax.block_until_ready(v)
            out[f"{tag}_compile_s"] = round(time.time() - t0, 1)
            float(np.asarray(jax.tree.leaves(v)[0]).ravel()[0])  # 1st readback
            t0 = time.perf_counter()
            v = prog(*args)
            float(np.asarray(jax.tree.leaves(v)[0]).ravel()[0])
            dt = time.perf_counter() - t0
            out[f"{tag}_ms_per_step"] = round(dt / K * 1000, 3)
        except Exception as e:  # noqa: BLE001 — fault-isolated rungs
            out[f"{tag}_error"] = f"{type(e).__name__}: {str(e)[:300]}"

    def keyed(st_rng, i):
        return jax.random.fold_in(jax.random.fold_in(st_rng, i), salt)

    # 1. sample + gather only.
    def build_gather():
        def prog(rng, data, tids, table):
            def body(c, i):
                ids = sample_ids(keyed(rng, i), table, tids, BATCH)
                b = gather_batch(data, ids, spec)
                return c + b.x.sum() + b.edge_attr.sum(), ()
            c, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(K, dtype=jnp.int32)
            )
            return c
        return jax.jit(prog), (state.rng, data, tids, table)

    timed("gather", build_gather)

    # 2. + eval-mode forward.
    def build_fwd():
        def prog(params, stats, rng, data, tids, table):
            def body(c, i):
                ids = sample_ids(keyed(rng, i), table, tids, BATCH)
                b = gather_batch(data, ids, spec)
                pred, _ = model.apply(
                    {"params": params, "batch_stats": stats}, b, train=False
                )
                return c + pred.sum(), ()
            c, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(K, dtype=jnp.int32)
            )
            return c
        return jax.jit(prog), (
            state.params, state.batch_stats, state.rng, data, tids, table
        )

    timed("forward", build_fwd)

    # 3. + loss + backward (no optimizer, no state threading).
    def build_bwd():
        loss_fn = trainer.loss_fn

        def build_loss(params, stats, b, rng):
            def inner(p):
                (pred, _aux), _upd = model.apply(
                    {"params": p, "batch_stats": stats},
                    b,
                    train=True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                return loss_fn(pred, b.y, b.graph_mask)
            return inner

        def prog(params, stats, rng, data, tids, table):
            def body(c, i):
                ids = sample_ids(keyed(rng, i), table, tids, BATCH)
                b = gather_batch(data, ids, spec)
                loss, grads = jax.value_and_grad(
                    build_loss(params, stats, b, jax.random.fold_in(rng, i))
                )(params)
                gsum = sum(
                    jnp.sum(g) for g in jax.tree.leaves(grads)
                )
                return c + loss + 0.0 * gsum, ()
            c, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(K, dtype=jnp.int32)
            )
            return c
        return jax.jit(prog), (
            state.params, state.batch_stats, state.rng, data, tids, table
        )

    timed("backward", build_bwd)

    # 4. full optimizer step (the real program). It donates its state
    # argument, so thread the evolving state through a holder instead of
    # re-passing a consumed buffer.
    def build_full():
        prog = trainer._train_steps_sample(K)
        holder = {"st": jax.tree.map(jnp.array, state)}

        def run(data, tids, table):
            new_st, losses, edges = prog(holder["st"], data, tids, table)
            holder["st"] = new_st
            return losses

        return run, (data, tids, table)

    timed("full_step", build_full)

    try:
        out["device"] = str(jax.devices()[0])
    except Exception:
        pass
    with open(os.path.join(HERE, "DIAG_TRAINSTEP.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
