"""Data-parallel training over a jax.sharding Mesh.

The reference has no intra-job distributed training at all (SURVEY §2.3);
this is new TPU-first design: molecules are sharded across chips on a 'data'
mesh axis. Each device receives its own fully-padded sub-batch (the host
loader builds one GraphBatch per device and stacks them on a leading axis),
the per-device train step runs under shard_map, and gradients sync with
``jax.lax.pmean`` over ICI inside the step.

Replicated state (params/opt state) + batch-sharded data is the right regime
for MolKGNN's model sizes (~10^5-10^6 params): the all-reduce is tiny
relative to the kernel-score matmuls, so scaling is near-linear until the
per-chip batch becomes MXU-starved. Model parallelism for giant batched
graphs lives in parallel/halo.py (node-sharded halo exchange) and
parallel/hybrid.py (2D data x model).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def stack_shards(batches: Sequence) -> object:
    """Stack per-device GraphBatches on a new leading device axis."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)


def nested_sample_scan(body, state, k: int, chunk: int):
    """Scan a ``body(st, _) -> (st, (loss, edges))`` K times, nested as
    (K//chunk x chunk) when ``chunk`` divides K (TrainConfig.scan_chunk:
    identical step sequence, program loop body bounded by the chunk).
    Returns ``(state, losses[K], edges[K])``. Shared by the single-device,
    DP, halo, and hybrid device-sampled step builders."""
    if chunk and k > chunk and k % chunk == 0:
        def outer(st, _):
            return jax.lax.scan(body, st, None, length=chunk)

        new_state, (losses, edges) = jax.lax.scan(
            outer, state, None, length=k // chunk
        )
        return new_state, losses.reshape(k), edges.reshape(k)
    new_state, (losses, edges) = jax.lax.scan(body, state, None, length=k)
    return new_state, losses, edges


def nested_ids_scan(body, state, ids_block, chunk: int):
    """Scan ``body(st, ids) -> (st, loss)`` over ``ids_block``'s leading
    axis (length K), nested as (K//chunk x chunk) when ``chunk`` divides K
    — the xs-carrying twin of ``nested_sample_scan``, shared by the
    host-id single-device and DP step builders. Returns
    ``(state, losses[K])``."""
    k = ids_block.shape[0]
    if chunk and k > chunk and k % chunk == 0:
        blocks = ids_block.reshape(k // chunk, chunk, *ids_block.shape[1:])

        def outer(st, blk):
            return jax.lax.scan(body, st, blk)

        st, losses = jax.lax.scan(outer, state, blocks)
        return st, losses.reshape(k)
    return jax.lax.scan(body, state, ids_block)


def shard_scan_steps(
    step_fn: Callable,
    gather: Callable,
    spec,
    mesh: Mesh,
    axis: str = "data",
    chunk: int = 0,
):
    """Device-resident DP training: scan K optimizer steps per dispatch over
    a mesh, assembling each chip's sub-batch ON DEVICE from sampled ids.

    This composes the two single-chip throughput wins (HBM-resident dataset
    + on-device gather, graphs/device_pack.py; K-step lax.scan fusion,
    Trainer.scan_steps) with data parallelism: the flat dataset pytree is
    replicated into every chip's HBM once, the [K, ndev, B] id block is
    sharded over ``axis`` (each chip sees [K, 1, B] — its own ids), and each
    scanned step gathers its padded sub-batch locally, computes grads, and
    pmeans them over ICI. Host->device traffic per dispatch is K*ndev*B ids
    (~KBs); everything else never leaves the chips.

    ``step_fn(state, batch, axis_name=...) -> (state, loss)`` must pmean its
    gradients over ``axis_name`` (the Trainer's step does). Returns a jitted
    ``fn(state, device_data, ids_block[K, ndev, B]) -> (state, loss[K])``
    with replicated outputs.

    ``chunk`` > 0 nests the K-step scan as (K//chunk x chunk) when chunk
    divides K — identical step sequence, program loop body bounded by the
    chunk (TrainConfig.scan_chunk rationale).
    """

    def per_device(state, data, ids_block):  # ids_block local: [K, 1, B]
        def body(st, ids):
            new_st, loss = step_fn(st, gather(data, ids[0], spec), axis_name=axis)
            return new_st, jax.lax.pmean(loss, axis)

        return nested_ids_scan(body, state, ids_block, chunk)

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_sample_steps(
    step_fn: Callable,
    gather: Callable,
    spec,
    mesh: Mesh,
    batch_size: int,
    k: int,
    salt: int,
    axis: str = "data",
    chunk: int = 0,
):
    """Device-resident DP training with ON-DEVICE id sampling: zero
    per-step host input at any device count.

    Composes shard_scan_steps with graphs/device_pack.sample_ids: every
    chip draws its own [B] weighted ids per scanned step (per-step key =
    fold_in(state.rng, step) -> salt -> axis_index, so replicas sample
    independent ids while their params stay bit-identical through the
    pmean), gathers its sub-batch from its HBM-resident dataset copy, and
    pmeans grads over ICI. Global batch = ndev*B i.i.d. draws from the
    oversampling distribution — the same distribution the host DP sampler
    feeds shard_scan_steps, different RNG stream.

    Returns a jitted ``fn(state, device_data, train_ids, table) ->
    (state, loss[K], edges[K])`` with replicated outputs; ``edges`` are
    the per-step GLOBAL true-edge counts (psum) for throughput accounting.
    """
    from molkgnn_tpu.graphs.device_pack import sample_ids

    def per_device(state, data, train_ids, table):
        me = jax.lax.axis_index(axis)

        def body(st, _):
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.fold_in(st.rng, st.step), salt),
                me,
            )
            ids = sample_ids(key, table, train_ids, batch_size)
            new_st, loss = step_fn(st, gather(data, ids, spec), axis_name=axis)
            edges = jax.lax.psum(data.edge_count[ids].sum(), axis)
            return new_st, (jax.lax.pmean(loss, axis), edges)

        return nested_sample_scan(body, state, k, chunk)

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_train_step(train_step: Callable, mesh: Mesh, axis: str = "data"):
    """SPMD-wrap ``train_step(state, batch, axis_name=...) -> (state, loss)``.

    State is replicated, the batch is sharded on its leading device axis
    (built with ``stack_shards``), and the step must pmean its gradients over
    ``axis_name`` (the Trainer's step does). Loss is pmean'd, so every
    replica returns identical (state, loss).
    """

    def per_device(state, batch):
        local = jax.tree.map(lambda x: x[0], batch)  # [1, ...] -> [...]
        new_state, loss = train_step(state, local, axis_name=axis)
        loss = jax.lax.pmean(loss, axis)
        return new_state, loss

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
