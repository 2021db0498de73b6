"""Hybrid 2D sharding: data-parallel groups x halo model parallelism.

The two scaling designs this framework ships — batch-sharded data
parallelism (parallel/data_parallel.py) and the node-sharded halo-exchange
partition (parallel/halo.py) — compose on one 2D device mesh
``Mesh(devices.reshape(Nd, Nm), ("data", "model"))``:

  * the global batch splits into ``Nd`` graph groups along the ``data``
    axis (molecules are independent, so groups never communicate except in
    the gradient/BN reductions), and
  * each group's packed graph is node-sharded over the ``Nm`` devices of
    its ``model`` row, with the per-layer boundary exchanges riding
    ``all_to_all`` over the ``model`` axis only.

Collective accounting per train step (the scaling-book recipe: shardings
annotated, XLA inserts the collectives, all of them mapped to mesh axes):

  * 2 x ``all_to_all`` per layer over ``model`` (halo features/scores) —
    the high-frequency traffic stays inside a model row (ICI-adjacent
    devices on a real slice),
  * ``psum`` over ``("data", "model")`` for the global train-mode BN
    statistics (tiny: one [F] vector triple),
  * ``psum(pooled)`` over ``model`` (graph embeddings within a group),
  * one grad reduction: ``psum(pmean(grads, model), data)``.

Gradient accounting extends halo.py's psum-transpose rule by one level:
within a model row the in-forward ``psum(pooled)`` hands every device a
cotangent scaled by ``Nm``, so ``pmean`` over ``model`` recovers that
group's exact gradient; the global objective is the masked MEAN over ALL
graphs (reference data.py:37 semantics), which each group enters as
``group_masked_sum / global_count`` — a plain SUM of per-group terms — so
the cross-group reduction is ``psum`` over ``data``, not ``pmean``.
Grad parity vs the single-device step on the undivided batch is asserted
in tests/test_parallel.py::test_hybrid_train_step_matches_single_device.

The contract being sharded is the reference's whole training path
(/root/reference/model.py:176-219 driving
/root/reference/models/MolKGNN/KernelLayer.py:109-123); the reference
itself is single-GPU (SURVEY §2.3) — this composition is new design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from molkgnn_tpu.graphs.batch import GraphBatch
from molkgnn_tpu.models.common import TorchLinear
from molkgnn_tpu.parallel.halo import (
    HaloBatch,
    _dropout,
    _encoder_forward,
    _local_halo,
    partition_halo,
)
from molkgnn_tpu.training.model import bce_with_logits_loss


def make_mesh_2d(
    n_data: int, n_model: int, axes: tuple = ("data", "model")
) -> Mesh:
    devs = np.asarray(jax.devices()[: n_data * n_model])
    return Mesh(devs.reshape(n_data, n_model), axes)


def partition_hybrid(
    groups: list[GraphBatch], n_model: int, caps: dict | None = None
) -> HaloBatch:
    """Partition each data group over ``n_model`` node shards and stack.

    Returns a HaloBatch whose arrays carry leading [n_data, n_model] mesh
    axes. All groups share one set of static capacities (the max over
    groups, or pinned ``caps`` from a sizing pass) so the whole run is one
    compiled program.
    """
    if caps is None:
        caps = None
        for g in groups:
            c = partition_halo(g, n_model).caps()
            if caps is None:
                caps = c
            else:
                caps = {
                    k: (
                        tuple(max(a, b) for a, b in zip(caps[k], c[k]))
                        if k == "buckets"
                        else max(caps[k], c[k])
                    )
                    for k in caps
                }
    parts = [partition_halo(g, n_model, caps=caps) for g in groups]
    return jax.tree.map(lambda *xs: np.stack(xs), *parts)


def hybrid_parallel_forward(
    model,  # MolKGNNNet encoder
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Jitted eval-mode encoder forward over the 2D mesh:
    ``(variables, stacked HaloBatch [Nd, Nm, ...]) -> [Nd, B, emb]`` —
    each data group's pooled embeddings, computed with the same
    model-axis exchanges as training (running BN stats, no dropout)."""
    ndev_m = int(mesh.shape[model_axis])

    def per_device(variables, hb):
        hb = jax.tree.map(lambda a: a[0, 0], hb)
        pooled, _ = _encoder_forward(
            model,
            variables["params"],
            variables["batch_stats"],
            hb,
            model_axis,
            ndev_m,
            train=False,
        )
        return pooled[None]  # [1, B, emb] -> gathered over data axis

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(data_axis, model_axis)),
        out_specs=P(data_axis),
        check_vma=False,
    )
    return jax.jit(fn)


def hybrid_eval_step(
    model,  # GNNModel wrapper (encoder=MolKGNNNet)
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Jitted eval-mode FULL-model forward over the 2D mesh:
    ``(params, batch_stats, stacked HaloBatch [Nd, Nm, ...]) ->
    logits [Nd, B]`` — Nd eval batches evaluated concurrently, each
    node-sharded over its model row (running BN stats, no dropout). The
    eval twin of ``hybrid_train_step`` used by the Trainer's
    model_parallel='hybrid' path."""
    ndev_m = int(mesh.shape[model_axis])
    encoder = model.encoder

    def per_device(params, stats, hb):
        hb = jax.tree.map(lambda a: a[0, 0], hb)
        pooled, _ = _encoder_forward(
            encoder,
            params["encoder"],
            stats["encoder"],
            hb,
            model_axis,
            ndev_m,
            train=False,
        )
        logits = TorchLinear(model.task_dim).apply(
            {"params": params["ffn"]}, pooled
        )[..., 0]
        return logits[None]  # [1, B] -> gathered over the data axis

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis, model_axis)),
        out_specs=P(data_axis),
        check_vma=False,
    )
    return jax.jit(fn)


def hybrid_train_step(
    model,  # GNNModel wrapper (encoder=MolKGNNNet)
    tx,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    loss_fn=bce_with_logits_loss,
):
    """Jitted FULL training step over the 2D data x model mesh.

    ``(TrainState, stacked HaloBatch [Nd, Nm, ...]) -> (TrainState, loss)``
    with exact single-device semantics on the undivided global batch:
    global (both-axes psum'd) train-mode BN statistics, the masked-mean
    loss over all real graphs, gradients through every exchange, and one
    replicated optimizer update. ``loss_fn`` must have masked-MEAN
    reduction (bce_with_logits_loss); its group value is re-weighted by
    group_count/global_count before the cross-group psum.
    """
    ndev_m = int(mesh.shape[model_axis])
    encoder = model.encoder

    def per_device(state, hb):
        hb = jax.tree.map(lambda a: a[0, 0], hb)
        return _hybrid_update(
            model, encoder, tx, loss_fn, data_axis, model_axis, ndev_m,
            state, hb, edge_bn_axis=data_axis,
        )

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(data_axis, model_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def _hybrid_update(
    model, encoder, tx, loss_fn, data_axis, model_axis, ndev_m, state, hb,
    edge_bn_axis,
):
    """Per-device hybrid train-step body: ``(state, per-device HaloBatch)
    -> (state, loss)``. Shared by ``hybrid_train_step`` (host-partitioned;
    edge_attr replicated within a model row so edge stats psum over data
    only) and ``hybrid_sample_steps`` (device-assembled; every device owns
    distinct edges so edge stats psum over BOTH axes)."""
    rng = jax.random.fold_in(state.rng, state.step)
    rng_enc, rng_ffn = jax.random.split(rng)
    # Decorrelate dropout across data groups (halo._encoder_forward
    # already folds in the model-axis index).
    rng_enc = jax.random.fold_in(rng_enc, jax.lax.axis_index(data_axis))
    rng_ffn = jax.random.fold_in(rng_ffn, jax.lax.axis_index(data_axis))

    def losses(params):
        pooled, enc_stats = _encoder_forward(
            encoder,
            params["encoder"],
            state.batch_stats["encoder"],
            hb,
            model_axis,
            ndev_m,
            train=True,
            dropout_rng=rng_enc,
            bn_axis=(data_axis, model_axis),
            edge_bn_axis=edge_bn_axis,
        )
        h = _dropout(rng_ffn, pooled, model.ffn_dropout_rate)
        logits = TorchLinear(model.task_dim).apply(
            {"params": params["ffn"]}, h
        )[..., 0]
        # Global masked mean: this group's masked SUM over the global
        # real-graph count (count psum has no parameter dependence, so
        # no gradient flows through it).
        cnt = jnp.sum(hb.graph_mask.astype(logits.dtype))
        total = jnp.maximum(jax.lax.psum(cnt, data_axis), 1.0)
        contrib = loss_fn(logits, hb.y, hb.graph_mask) * cnt / total
        return contrib, {"encoder": enc_stats}

    (contrib, new_stats), grads = jax.value_and_grad(
        losses, has_aux=True
    )(state.params)
    # pmean over model recovers each group's exact gradient (halo.py's
    # psum-transpose rule); groups then SUM into the global-mean
    # objective's gradient.
    grads = jax.lax.psum(jax.lax.pmean(grads, model_axis), data_axis)
    loss = jax.lax.psum(contrib, data_axis)
    # BN stats were psum'd over both axes in-forward: already global
    # and identical on every device.
    up, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, up)
    new_state = state.replace(
        step=state.step + 1,
        params=params,
        batch_stats=new_stats,
        opt_state=opt_state,
    )
    return new_state, loss


def hybrid_sample_steps(
    model,  # GNNModel wrapper (encoder=MolKGNNNet)
    tx,
    mesh: Mesh,
    shard_spec,
    batch_size: int,
    k: int,
    salt: int,
    data_axis: str = "data",
    model_axis: str = "model",
    loss_fn=bce_with_logits_loss,
    chunk: int = 0,
):
    """K hybrid (data x model) optimizer steps per dispatch with ZERO
    per-step host input — the 2D twin of halo.halo_sample_steps.

    Per scanned step each data group draws its OWN [batch_size] weighted
    ids (per-step key = fold_in(rng, step) -> salt -> data index, so the
    nm devices of a model row agree on their group's ids while groups
    sample independently — the same fold order as DP's
    shard_sample_steps); each device slices its batch_size/nm molecules,
    assembles its padded sub-batch on device from the replicated
    HBM-resident DeviceDataset, wraps it as a molecule-aligned empty-cut
    HaloBatch, and runs the exact hybrid train-step body
    (``_hybrid_update``): both-axes psum'd BN statistics, the global
    masked-mean loss over all nd*batch_size graphs, psum(pmean(grads,
    model), data), AdamW. Global batch per optimizer step = nd *
    batch_size i.i.d. draws — the same semantics the host-fed hybrid path
    gets from nd loader batches.

    Returns a jitted ``fn(state, device_data, train_ids, table) ->
    (state, loss[K], edges[K])`` with replicated outputs; ``edges`` are
    per-step global true-edge counts.
    """
    from molkgnn_tpu.graphs.device_pack import gather_batch, sample_ids

    nm = int(mesh.shape[model_axis])
    if batch_size % nm:
        raise ValueError(
            f"hybrid_sample_steps: batch_size {batch_size} not divisible"
            f" by {nm} model shards"
        )
    bs_shard = batch_size // nm
    if shard_spec.num_graphs != bs_shard:
        raise ValueError(
            f"shard_spec.num_graphs={shard_spec.num_graphs} != "
            f"batch_size/nm={bs_shard}"
        )
    encoder = model.encoder

    def per_device(state, data, train_ids, table):
        mm = jax.lax.axis_index(model_axis)

        def body(st, _):
            key = jax.random.fold_in(
                jax.random.fold_in(st.rng, st.step), salt
            )
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
            ids = sample_ids(key, table, train_ids, batch_size)
            mine = jax.lax.dynamic_slice(ids, (mm * bs_shard,), (bs_shard,))
            local = gather_batch(data, mine, shard_spec)
            hb = _local_halo(local, nm, mm * bs_shard, model_axis)
            new_st, loss = _hybrid_update(
                model, encoder, tx, loss_fn, data_axis, model_axis, nm,
                st, hb, edge_bn_axis=(data_axis, model_axis),
            )
            edges = jax.lax.psum(
                jax.lax.psum(data.edge_count[mine].sum(), model_axis),
                data_axis,
            )
            return new_st, (loss, edges)

        from molkgnn_tpu.parallel.data_parallel import nested_sample_scan

        return nested_sample_scan(body, state, k, chunk)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))
