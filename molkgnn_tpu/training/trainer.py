"""Training harness: jitted train/eval steps, epoch loop, checkpoints.

Replaces the reference's PyTorch-Lightning wiring (/root/reference/entry.py
:185-314, model.py:176-358) with an explicit JAX loop:

  * one compiled train step (forward + backward + AdamW + schedule) over
    fixed-shape GraphBatches — recompiles only if the BatchSpec changes;
  * validation each epoch on the valid split (plus optionally the train split
    in eval mode, the reference's ``--train_metric`` dual-loader quirk,
    data.py:191-214 / model.py:221-296, reported with a ``_no_dropout``
    suffix);
  * best-checkpoint tracking per monitored metric (the reference's four
    ModelCheckpoints: best logAUC_0.001_0.1, best AUC, best/min loss, last —
    entry.py:187-237) via orbax;
  * test procedure that evaluates last + each best checkpoint and writes
    ``test_result.log`` / ``test_sample_scores.log`` compatible records
    (entry.py:156-182, model.py:344-349).

Data parallelism: when constructed with a ``jax.sharding.Mesh``, steps are
jitted with batch-dim shardings over the mesh's 'data' axis (see
parallel/data_parallel.py); gradients all-reduce via XLA collectives.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, List, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from molkgnn_tpu.data.dataset import Dataset, GraphLoader
from molkgnn_tpu.graphs.batch import BatchSpec, GraphBatch
from molkgnn_tpu.training.metrics import compute_metrics
from molkgnn_tpu.training.model import GNNModel, LOSSES
from molkgnn_tpu.training.optim import make_optimizer
from molkgnn_tpu.training.schedule import polynomial_warmup_decay


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 16
    max_epochs: int = 20
    peak_lr: float = 5e-3
    end_lr: float = 1e-10
    warmup_iterations: int = 300
    weight_decay: float = 1e-3
    seed: int = 42
    oversample: bool = True
    train_metric: bool = False
    monitors: tuple = ("logAUC_0.001_0.1", "AUC", "loss")
    log_dir: str = "logs"
    checkpoint_dir: Optional[str] = None
    tot_iterations: Optional[int] = None  # derived like entry.py:97-101
    progress: bool = True
    # Dump per-epoch validation predictions to
    # log_dir/valid_predictions/epoch_N (reference --record_valid_pred,
    # model.py:262-268).
    record_valid_pred: bool = False
    # Gradient hygiene: optional global-norm clipping (the ChIRo standalone
    # loops clip at 10, gnn_3D/train_functions.py) and a skip-on-nonfinite
    # guard that drops a diverged step instead of poisoning the params.
    grad_clip_norm: Optional[float] = None
    skip_nonfinite_updates: bool = False
    # Keep the flat-packed dataset in HBM and assemble batches on device
    # from sampled graph ids (graphs/device_pack.py). Enabled automatically
    # for the default (kgnn) batch family on a single device; per-step
    # host->device traffic drops to the id vector.
    use_device_data: bool = True
    # Compose each epoch's batches by dealing the sampled ids round-robin
    # in decreasing size order (graphs/balance.py) instead of consuming the
    # sampler stream in draw order. Per-batch field sums then concentrate
    # around the mean, which lets a tight sampler-aware BatchSpec
    # (balance.spec_for_dataset) replace the ~55%-occupancy cover spec —
    # identical math on real rows. NOTE: measured on TPU this LOSES
    # throughput end-to-end (benchmarks/BALANCED_AB.json: 0.70-0.87x the
    # cover spec — the cover matmuls are already MXU-saturated and the
    # dealing sits on the dispatch path); use it to FIT memory, not to go
    # faster. Requires the device-data path; every dealt epoch is
    # host-checked against the spec (gather_batch cannot detect overflow
    # on device).
    balanced_batches: bool = False
    # Fuse this many optimizer steps into ONE device dispatch with lax.scan
    # (device-data path only). Each dispatch pays the host->device program
    # launch latency once instead of per step — on a latency-bound config
    # (small molecules, tunneled TPU) this is the main e2e overhead. The
    # math is identical to step-by-step execution (same RNG fold-in per
    # step, same updates); only the dispatch granularity changes.
    scan_steps: int = 1
    # Factor a K-step fused dispatch into an outer lax.scan over K//chunk
    # inner chunk-step scan blocks (nested scan) whenever chunk divides K.
    # The step SEQUENCE and math are identical to the flat scan — same RNG
    # fold-ins, same updates, same losses — only the loop nesting changes,
    # which bounds the compiled program's loop body independently of K.
    # Motivation: the relay backend's remote compiler has a measured
    # capacity limit on (batch x flat scan length) — (b8192 x scan80) dies
    # with UNAVAILABLE while smaller flat scans compile
    # (benchmarks/B8192_BISECT.json) — so the saturation bench row can keep
    # the same 80-step window structure as the headline by nesting 8x10
    # instead of falling back to shorter dispatches. 0 = flat scan.
    scan_chunk: int = 0
    # Sample the training ids ON DEVICE (graphs/device_pack.sample_ids):
    # each fused step draws its [B] ids from the oversampling distribution
    # with the train RNG (alias-method draw over a device-resident
    # table), so a
    # training dispatch consumes NO per-step host input at all — the whole
    # epoch runs from HBM and only the per-epoch loss vector comes back.
    # Same sampler semantics as the host path (i.i.d. weighted draws with
    # replacement, the reference's WeightedRandomSampler contract,
    # /root/reference/data.py:144-166) but a different (device) RNG stream.
    # Removes the per-step id H2D transfer, which is the entire remaining
    # host dependency of the device-data loop (measured +26% end-to-end on
    # a degraded tunnel link, benchmarks/DEVSAMPLE_DEGRADED_AB.json).
    # Works single-device and data-parallel (each chip draws its own ids,
    # parallel/data_parallel.shard_sample_steps); requires the device-data
    # path with oversample=True (shuffle-without-replacement epochs stay
    # on the host sampler).
    device_sampling: bool = False
    # Preemption-safe training (framework extension; the reference has no
    # fault tolerance beyond crash-level retries, SURVEY §5): when set,
    # fit() writes a full-state autosave (save_state + history) after every
    # epoch, RESUMES from it if one exists at the given path, and installs
    # a SIGTERM/SIGINT handler for the duration of fit() that finishes the
    # current epoch, autosaves, and returns early instead of dying mid-run
    # — the contract preemptible/spot TPU jobs need.
    autosave_path: Optional[str] = None
    # Model parallelism for the kgnn family: "halo" runs training AND
    # evaluation through the node-sharded halo-exchange partition
    # (parallel/halo.py) over the Trainer's mesh — each batch is
    # host-partitioned with run-pinned capacities (one compiled program)
    # and the full step (psum'd BN stats, grads through the exchanges,
    # pmean reduction, AdamW) executes under shard_map. "hybrid" composes
    # data x model parallelism over a 2D mesh (parallel/hybrid.py): each
    # optimizer step consumes mesh.shape['data'] loader batches (global
    # batch = nd * batch_size; pass tot_iterations explicitly if the LR
    # schedule must account for the larger step), each node-sharded over
    # its model row. None = data parallelism over the mesh (the default
    # regime).
    model_parallel: Optional[str] = None

    def resolve_tot_iterations(self, num_train: int) -> int:
        if self.tot_iterations is not None:
            return self.tot_iterations
        # ceil(train/batch)*max_epochs + 2 (entry.py:97-101)
        per_epoch = -(-num_train // self.batch_size)
        return per_epoch * self.max_epochs + 2


class Trainer:
    def __init__(
        self,
        model: GNNModel,
        dataset: Dataset,
        spec: BatchSpec,
        config: TrainConfig,
        mesh: Optional[jax.sharding.Mesh] = None,
        collate=None,
        monitor=None,
    ):
        self.model = model
        self.dataset = dataset
        self.spec = spec
        self.config = config
        self.mesh = mesh
        self.collate = collate
        self.monitor = monitor
        self.loss_fn = LOSSES[dataset.loss_name]
        self.history: List[Dict[str, float]] = []
        self.best: Dict[str, float] = {}
        self._ckpts: Dict[str, Any] = {}

        n_train = len(dataset.split["train"])
        tot = config.resolve_tot_iterations(n_train)
        self.schedule = polynomial_warmup_decay(
            peak_lr=config.peak_lr,
            end_lr=config.end_lr,
            warmup_iterations=config.warmup_iterations,
            tot_iterations=tot,
        )

        # --- init ---
        rng = jax.random.key(config.seed)
        init_rng, state_rng = jax.random.split(rng)
        self._counts = None  # lazy count_matrix cache (balanced mode)
        dummy_graphs = dataset.subset("train")[: config.batch_size]
        if config.balanced_batches:
            if collate is not None or not config.use_device_data:
                raise ValueError(
                    "balanced_batches requires the device-data path "
                    "(use_device_data=True, default collate)"
                )
            # The first batch_size train graphs need not fit a tight spec;
            # init from a dealt row, which is what training will dispatch.
            from molkgnn_tpu.graphs.balance import SIZE_FIELD, deal_by_size

            counts = self._graph_counts()
            train_ids = np.asarray(dataset.split["train"])
            idm, _ = deal_by_size(
                train_ids, counts[train_ids, SIZE_FIELD], config.batch_size
            )
            dummy_graphs = [dataset.graphs[i] for i in idm[0] if i >= 0]
        dummy = next(
            iter(
                GraphLoader(
                    dummy_graphs,
                    spec,
                    config.batch_size,
                    collate=collate,
                )
            )
        )
        # Jit the init: flax's eager init dispatches every op individually,
        # which over the tunneled single-chip link costs minutes (measured
        # ~200s for the flagship model); one jitted program is a single
        # compile + execution (~20s cold, ~0s warm).
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            init_rng, dummy
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.tx = make_optimizer(
            params,
            self.schedule,
            weight_decay=config.weight_decay,
            grad_clip_norm=config.grad_clip_norm,
        )
        self.state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=jax.jit(self.tx.init)(params),
            rng=state_rng,
        )
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

        self._halo_step = None
        self._halo_caps = None
        # Eval-split partition cache (r4): eval batches are deterministic
        # (shuffle=False) and partitioning is host-side numpy, so the
        # halo/hybrid predict paths partition each split ONCE per (split,
        # pinned-caps) instead of every epoch. Keyed by the graphs' idx
        # tuple + the caps (a cap regrow invalidates naturally).
        self._eval_part_cache: Dict = {}
        self._hybrid_step = None
        self._hybrid_caps = None
        if config.model_parallel is not None:
            if config.model_parallel not in ("halo", "hybrid"):
                raise ValueError(
                    f"unknown model_parallel={config.model_parallel!r}"
                    " (supported: 'halo', 'hybrid')"
                )
            if mesh is None:
                raise ValueError(
                    f"model_parallel={config.model_parallel!r} requires a mesh"
                )
            if collate is not None:
                raise ValueError(
                    "model_parallel supports the kgnn batch family"
                    " only (default collate)"
                )
            if config.model_parallel == "halo":
                from molkgnn_tpu.parallel.halo import (
                    halo_eval_step,
                    halo_train_step,
                )

                self._halo_step = halo_train_step(
                    model, self.tx, mesh, loss_fn=self.loss_fn
                )
                self._halo_eval = halo_eval_step(model, mesh)
            else:
                if set(mesh.shape) != {"data", "model"}:
                    raise ValueError(
                        "model_parallel='hybrid' needs a 2D mesh with"
                        f" axes ('data', 'model'); got {tuple(mesh.shape)}"
                    )
                from molkgnn_tpu.parallel.hybrid import (
                    hybrid_eval_step,
                    hybrid_train_step,
                )

                self._hybrid_step = hybrid_train_step(
                    model, self.tx, mesh, loss_fn=self.loss_fn
                )
                self._hybrid_eval = hybrid_eval_step(model, mesh)

        self._device_data = None
        self._shard_spec = None
        self._gather_fn = None
        # The device-resident input pipeline covers ALL families since
        # r4: kgnn (collate=None -> graphs/device_pack), the 3D point-cloud
        # families (PointBatchSpec -> graphs/device_points), and chironet
        # (ChiroBatchSpec -> graphs/device_chiro).
        point_family = chiro_family = False
        if collate is not None and config.use_device_data:
            from molkgnn_tpu.graphs.chiro import ChiroBatchSpec
            from molkgnn_tpu.graphs.geometric import PointBatchSpec

            point_family = isinstance(spec, PointBatchSpec)
            chiro_family = isinstance(spec, ChiroBatchSpec)
        if (
            (collate is None or point_family or chiro_family)
            and config.use_device_data
            and config.model_parallel is None
        ):
            if collate is None:
                from molkgnn_tpu.graphs.device_pack import (
                    DeviceDataset,
                    gather_batch,
                )
                from molkgnn_tpu.graphs.packed import PackedGraphs

                self._device_data = DeviceDataset.from_packed(
                    PackedGraphs.from_graphs(dataset.graphs)
                )
                self._gather_fn = gather_batch
            elif point_family:
                from molkgnn_tpu.graphs.device_points import (
                    DevicePointDataset,
                    gather_points,
                )

                self._device_data = DevicePointDataset.from_graphs(
                    dataset.graphs, spec
                )
                self._gather_fn = gather_points
            else:
                from molkgnn_tpu.graphs.device_chiro import (
                    DeviceChiroDataset,
                    gather_chiro,
                )

                self._device_data = DeviceChiroDataset.from_graphs(
                    dataset.graphs
                )
                self._gather_fn = gather_chiro
            self._eval_step_ids = self._build_eval_step_ids()
            self._eval_steps_scan = self._build_eval_steps_scan()
            if mesh is None:
                self._train_step_ids = self._build_train_step_ids()
                self._train_steps_scan = self._build_train_steps_scan()
                if config.device_sampling:
                    self._init_sample_consts()
                    self._sample_programs: Dict[int, Callable] = {}
            else:
                # Device-resident DP: dataset replicated in every chip's
                # HBM, id blocks sharded over the mesh, K steps fused per
                # dispatch (parallel/data_parallel.shard_scan_steps).
                from jax.sharding import NamedSharding, PartitionSpec

                from molkgnn_tpu.parallel.data_parallel import (
                    shard_scan_steps,
                )

                # Replicate the dataset over the mesh ONCE. Without this the
                # leaves carry SingleDeviceSharding(device 0) while the
                # shard_map'd step expects NamedSharding(mesh, P()), so jit
                # would re-broadcast the whole dataset (~100s of MB) on
                # EVERY dispatch.
                self._device_data = jax.device_put(
                    self._device_data, NamedSharding(mesh, PartitionSpec())
                )
                self._train_steps_scan_dp = shard_scan_steps(
                    self._train_step_fn, self._gather_fn, spec, mesh,
                    chunk=config.scan_chunk,
                )
                if config.device_sampling:
                    self._init_sample_consts()
                    self._sample_programs = {}
        elif (
            collate is None
            and config.use_device_data
            and config.device_sampling
            and config.model_parallel in ("halo", "hybrid")
        ):
            # Device-resident MODEL-PARALLEL feeding (VERDICT r3 item 2):
            # the host-fed halo/hybrid loop pays loader collation + numpy
            # partition + a full HaloBatch H2D per optimizer step; here the
            # dataset is replicated into every chip's HBM once, each shard
            # samples/slices/assembles its molecule-aligned sub-batch ON
            # DEVICE, and K steps fuse per dispatch — zero per-step host
            # input (parallel/halo.halo_sample_steps and
            # parallel/hybrid.hybrid_sample_steps).
            from jax.sharding import NamedSharding, PartitionSpec

            from molkgnn_tpu.graphs import spec_for_graphs
            from molkgnn_tpu.graphs.device_pack import DeviceDataset
            from molkgnn_tpu.graphs.packed import PackedGraphs

            nm = (
                int(mesh.shape["model"])
                if config.model_parallel == "hybrid"
                else int(np.prod(list(mesh.shape.values())))
            )
            if config.batch_size % nm:
                raise ValueError(
                    f"device_sampling with model_parallel="
                    f"{config.model_parallel!r} needs batch_size divisible"
                    f" by the {nm} model shards (got {config.batch_size})"
                )
            self._shard_spec = spec_for_graphs(
                dataset.graphs, batch_size=config.batch_size // nm
            )
            self._device_data = jax.device_put(
                DeviceDataset.from_packed(
                    PackedGraphs.from_graphs(dataset.graphs)
                ),
                NamedSharding(mesh, PartitionSpec()),
            )
            self._init_sample_consts()
            self._sample_programs = {}
        if config.device_sampling and self._device_data is None:
            raise ValueError(
                "device_sampling requires the device-data path (default "
                "collate, use_device_data=True)"
            )

    # ------------------------------------------------------------------
    def _build_train_step(self) -> Callable:
        model, tx, loss_fn = self.model, self.tx, self.loss_fn
        skip_nonfinite = self.config.skip_nonfinite_updates

        def train_step(
            state: TrainState, batch: GraphBatch, axis_name: str | None = None
        ):
            dropout_rng = jax.random.fold_in(state.rng, state.step)

            def losses(params):
                (pred, _), updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch,
                    train=True,
                    rngs={"dropout": dropout_rng},
                    mutable=["batch_stats"],
                )
                return loss_fn(pred, batch.y, batch.graph_mask), updates

            (loss, updates), grads = jax.value_and_grad(
                losses, has_aux=True
            )(state.params)
            if axis_name is not None:
                # DP sync: average grads and batch stats across replicas so
                # every chip applies the identical update (ICI all-reduce).
                grads = jax.lax.pmean(grads, axis_name)
                updates = jax.lax.pmean(updates, axis_name)
            up, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, up)
            if skip_nonfinite:
                # Drop the whole update when any grad is non-finite; the
                # step counter still advances so the LR schedule stays on
                # its budget.
                finite = jnp.all(
                    jnp.asarray(
                        [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
                    )
                )
                params = jax.tree.map(
                    lambda new, old: jnp.where(finite, new, old),
                    params,
                    state.params,
                )
                opt_state = jax.tree.map(
                    lambda new, old: jnp.where(finite, new, old)
                    if hasattr(new, "dtype")
                    else new,
                    opt_state,
                    state.opt_state,
                )
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=updates["batch_stats"],
                opt_state=opt_state,
            )
            return new_state, loss

        self._train_step_fn = train_step
        if self.mesh is not None:
            from molkgnn_tpu.parallel.data_parallel import shard_train_step

            return shard_train_step(train_step, self.mesh)
        return jax.jit(train_step, donate_argnums=(0,))

    def _build_train_step_ids(self) -> Callable:
        gather_batch = self._gather_fn
        spec, step_fn = self.spec, self._train_step_fn

        def train_step_ids(state, data, ids):
            return step_fn(state, gather_batch(data, ids, spec))

        return jax.jit(train_step_ids, donate_argnums=(0,))

    def _build_train_steps_scan(self) -> Callable:
        """K optimizer steps per dispatch: scan the train step over a
        [K, B] block of sampled graph ids. One program launch amortizes the
        per-dispatch latency across K steps; per-step semantics (dropout
        fold-in by step counter, AdamW, schedule) are unchanged."""
        from molkgnn_tpu.parallel.data_parallel import nested_ids_scan

        gather_batch = self._gather_fn
        spec, step_fn = self.spec, self._train_step_fn
        chunk = self.config.scan_chunk

        def train_steps(state, data, ids_block):
            def body(st, ids):
                return step_fn(st, gather_batch(data, ids, spec))

            return nested_ids_scan(body, state, ids_block, chunk)

        return jax.jit(train_steps, donate_argnums=(0,))

    # Distinct fold-in salt so the device sampler's per-step keys never
    # collide with the dropout stream (which folds the bare step counter).
    _SAMPLE_SALT = 0x5A17

    def _init_sample_consts(self):
        """Device-resident sampler constants for config.device_sampling:
        the train id vector and the oversampling alias table. Replicated
        over the mesh when there is one."""
        from molkgnn_tpu.data.dataset import oversampling_weights
        from molkgnn_tpu.graphs.device_pack import alias_sampler

        if not self.config.oversample:
            raise ValueError(
                "device_sampling reproduces the oversampling "
                "(with-replacement) sampler; shuffle epochs stay on the "
                "host path"
            )
        if self.config.balanced_batches:
            raise ValueError(
                "device_sampling and balanced_batches are mutually "
                "exclusive (dealing is host-side)"
            )
        train_ids = np.asarray(self.dataset.split["train"], np.int32)
        labels = np.array([self.dataset.graphs[i].y for i in train_ids])
        consts = (
            jnp.asarray(train_ids),
            jax.tree.map(
                jnp.asarray, alias_sampler(oversampling_weights(labels))
            ),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            consts = jax.device_put(
                consts, NamedSharding(self.mesh, PartitionSpec())
            )
        self._sample_consts = consts

    def _train_steps_sample(self, k: int) -> Callable:
        """K optimizer steps per dispatch with the ids SAMPLED ON DEVICE
        (config.device_sampling): the scan body draws [B] weighted ids from
        the device-resident alias table with a per-step key folded from the
        state RNG, assembles the batch from HBM, and steps the optimizer —
        zero per-step host input. Returns (state, losses [K], edges [K]);
        the per-step true-edge counts make throughput accounting possible
        without the host knowing which ids were drawn. Programs are cached
        per K (the epoch remainder needs one extra, smaller program)."""
        prog = self._sample_programs.get(k)
        if prog is not None:
            return prog
        from molkgnn_tpu.graphs.device_pack import sample_ids
        from molkgnn_tpu.parallel.data_parallel import nested_sample_scan

        gather_batch = self._gather_fn
        spec, step_fn = self.spec, self._train_step_fn
        bs, salt = self.config.batch_size, self._SAMPLE_SALT

        if self.config.model_parallel == "halo":
            # Device-resident halo training: each shard samples the same
            # global ids (single-device key stream), slices its molecules,
            # assembles on device, and runs the exact halo step body.
            from molkgnn_tpu.parallel.halo import halo_sample_steps

            prog = halo_sample_steps(
                self.model, self.tx, self.mesh, self._shard_spec, bs, k,
                salt, loss_fn=self.loss_fn, chunk=self.config.scan_chunk,
            )
            self._sample_programs[k] = prog
            return prog
        if self.config.model_parallel == "hybrid":
            from molkgnn_tpu.parallel.hybrid import hybrid_sample_steps

            prog = hybrid_sample_steps(
                self.model, self.tx, self.mesh, self._shard_spec, bs, k,
                salt, loss_fn=self.loss_fn, chunk=self.config.scan_chunk,
            )
            self._sample_programs[k] = prog
            return prog
        if self.mesh is not None:
            # DP composition: every chip draws its own [B] ids per step
            # (global batch ndev*B), pmeans grads (data_parallel.py).
            from molkgnn_tpu.parallel.data_parallel import shard_sample_steps

            prog = shard_sample_steps(
                step_fn, gather_batch, spec, self.mesh, bs, k, salt,
                chunk=self.config.scan_chunk,
            )
            self._sample_programs[k] = prog
            return prog

        chunk = self.config.scan_chunk

        def train_steps(state, data, train_ids, table):
            def body(st, _):
                key = jax.random.fold_in(
                    jax.random.fold_in(st.rng, st.step), salt
                )
                ids = sample_ids(key, table, train_ids, bs)
                new_st, loss = step_fn(st, gather_batch(data, ids, spec))
                return new_st, (loss, data.edge_count[ids].sum())

            # Same step sequence whether nested or flat: the per-step RNG
            # folds in st.step, which advances identically.
            return nested_sample_scan(body, state, k, chunk)

        prog = jax.jit(train_steps, donate_argnums=(0,))
        self._sample_programs[k] = prog
        return prog

    def _build_eval_step_ids(self) -> Callable:
        gather_batch = self._gather_fn
        model, spec = self.model, self.spec

        def eval_step_ids(params, batch_stats, data, ids):
            batch = gather_batch(data, ids, spec)
            pred, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                train=False,
            )
            return pred

        return jax.jit(eval_step_ids)

    def _build_eval_steps_scan(self) -> Callable:
        """Whole-split evaluation in ONE dispatch: lax.scan over the
        [nblocks, B] id matrix, assembling each batch on device
        (r4; previously _predict_ids dispatched once per batch — a split
        of thousands of molecules paid hundreds of link round trips per
        epoch). Programs cache per nblocks (splits have fixed sizes, so
        at most one compile per split size per run).

        With a data-parallel mesh (r5), the block matrix is sharded over
        the 'data' axis under shard_map — each chip evaluates its own
        blocks against the replicated dataset, so eval throughput scales
        with the mesh like training's (``_predict_ids`` pads the block
        count to a device multiple with masked all-(-1) blocks)."""
        gather_batch = self._gather_fn
        model, spec = self.model, self.spec

        if self.mesh is not None and self.config.model_parallel is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def per_device(params, batch_stats, data, ids_block):
                def body(_, ids):  # ids_block local: [K, 1, B]
                    pred, _ = model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        gather_batch(data, ids[0], spec),
                        train=False,
                    )
                    return None, pred

                _, preds = jax.lax.scan(body, None, ids_block)
                return preds[:, None]  # [K, 1, B]

            return jax.jit(
                shard_map(
                    per_device,
                    mesh=self.mesh,
                    in_specs=(P(), P(), P(), P(None, "data")),
                    out_specs=P(None, "data"),
                    check_vma=False,
                )
            )

        def eval_steps(params, batch_stats, data, ids_block):
            def body(_, ids):
                batch = gather_batch(data, ids, spec)
                pred, _ = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch,
                    train=False,
                )
                return None, pred

            _, preds = jax.lax.scan(body, None, ids_block)
            return preds  # [nblocks, B]

        return jax.jit(eval_steps)

    def _eval_flat(self, idm: np.ndarray) -> np.ndarray:
        """Run the eval scan over [nblocks, B] id blocks; returns the flat
        prediction vector aligned with ``idm.reshape(-1)``. On a DP mesh
        the blocks are padded to a device multiple (masked -1 blocks,
        dropped from the result) and sharded over the 'data' axis."""
        idm = np.asarray(idm, np.int32)
        # The DP shard_map eval program expects [K, ndev, B] whenever it
        # was built (any device count, including ndev=1).
        dp = self.mesh is not None and self.config.model_parallel is None
        nd = int(self.mesh.shape["data"]) if dp else 1
        feed = idm
        if dp:
            if idm.shape[0] % nd:
                feed = np.concatenate(
                    [
                        idm,
                        np.full(
                            (nd - idm.shape[0] % nd, idm.shape[1]),
                            -1,
                            np.int32,
                        ),
                    ]
                )
            feed = feed.reshape(feed.shape[0] // nd, nd, idm.shape[1])
        flat = np.asarray(
            self._eval_steps_scan(
                self.state.params,
                self.state.batch_stats,
                self._device_data,
                feed,
            )
        ).reshape(-1)
        return flat[: idm.size]

    def _build_eval_step(self) -> Callable:
        model = self.model

        def eval_step(params, batch_stats, batch: GraphBatch):
            pred, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                train=False,
            )
            return pred

        return jax.jit(eval_step)

    # ------------------------------------------------------------------
    def _graph_counts(self):
        """Cached [G, 6] per-graph padded-field sizes (balanced mode)."""
        if self._counts is None:
            from molkgnn_tpu.graphs.balance import count_matrix

            self._counts = count_matrix(self.dataset.graphs)
        return self._counts

    def _epoch_id_batches(self, cfg):
        """Sampled train ids per step (device-data path): reproduces the
        loader's oversampling/shuffle semantics over global graph ids.
        With cfg.balanced_batches the epoch's sampled multiset is dealt by
        size into near-equal-sum batches and host-checked against the spec
        (see graphs/balance.py)."""
        from molkgnn_tpu.data.dataset import oversampling_weights
        from molkgnn_tpu.graphs.device_pack import pad_ids

        if not hasattr(self, "_id_rng"):
            self._id_rng = np.random.default_rng(cfg.seed)
        if not hasattr(self, "_sampler_cache"):
            # Label gather + weight normalization are epoch-invariant;
            # recomputing them per epoch costs ~0.5 ms of Python attribute
            # walks per dispatch on small pools — measurable against a
            # ~0.15 ms/step device time (benchmarks/device_step_time.py).
            train_ids = np.asarray(self.dataset.split["train"])
            p = None
            if cfg.oversample:
                labels = np.array(
                    [self.dataset.graphs[i].y for i in train_ids]
                )
                w = oversampling_weights(labels)
                p = w / w.sum()
            self._sampler_cache = (train_ids, p)
        train_ids, p = self._sampler_cache
        n = train_ids.shape[0]
        if cfg.oversample:
            order = self._id_rng.choice(n, size=n, replace=True, p=p)
        else:
            order = self._id_rng.permutation(n)
        sampled = train_ids[order]
        bs = cfg.batch_size
        if cfg.balanced_batches:
            from molkgnn_tpu.graphs.balance import (
                SIZE_FIELD,
                check_batches_fit,
                deal_by_size,
            )

            counts = self._graph_counts()
            idm, _ = deal_by_size(sampled, counts[sampled, SIZE_FIELD], bs)
            check_batches_fit(idm, counts, self.spec)
            yield from idm
            return
        for start in range(0, n, bs):
            chunk = sampled[start : start + bs]
            # numpy out: jit transfers the ~1KB id vector itself; creating
            # device arrays here would force expensive readbacks on any
            # host-side consumer (tunneled-TPU D2H is pathological).
            yield pad_ids(chunk, bs)

    def _predict_ids(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Evaluation over the device-resident dataset: only id vectors go
        host->device; predictions come back in ONE readback. In balanced
        mode the ids are dealt by size (sequential chunks of an arbitrary
        split can overflow a tight spec) and predictions are scattered back
        to the caller's order via the deal's position matrix."""
        from molkgnn_tpu.graphs.device_pack import pad_ids

        bs = self.config.batch_size
        ids = np.asarray(ids)
        if self.config.balanced_batches:
            from molkgnn_tpu.graphs.balance import (
                SIZE_FIELD,
                check_batches_fit,
                deal_by_size,
            )

            counts = self._graph_counts()
            idm, posm = deal_by_size(ids, counts[ids, SIZE_FIELD], bs)
            check_batches_fit(idm, counts, self.spec)
            flat = self._eval_flat(idm)
            valid = (idm >= 0).reshape(-1)
            pred = np.empty(len(ids), np.float32)
            pred[posm.reshape(-1)[valid]] = flat[valid]
        else:
            idm = np.stack(
                [
                    pad_ids(ids[start : start + bs], bs)
                    for start in range(0, len(ids), bs)
                ]
            )
            flat = self._eval_flat(idm)
            pred = flat[(idm >= 0).reshape(-1)]
        true = np.array([self.dataset.graphs[i].y for i in ids], np.float32)
        return true, pred

    def _partition_halo_pinned(self, batch):
        """Partition a batch over the mesh with RUN-PINNED capacities so
        every dispatch of the run hits one compiled program. Capacities
        come from the first batch seen, widened by a margin (sampled
        batches vary in halo size). A later batch that still overflows
        re-widens the caps from the offender and pays ONE recompile
        instead of killing the run — by construction caps only grow, so
        re-widening converges."""
        from molkgnn_tpu.parallel.halo import partition_halo

        ndev = int(np.prod(list(self.mesh.shape.values())))
        margin = 1.5

        def widen(base):
            w = lambda v: int(-(-int(v * margin) // 8) * 8)
            return {
                "ns": base["ns"],  # spec-fixed: total nodes / ndev
                "hp": w(base["hp"]),
                "el": w(base["el"]),
                "eh": w(base["eh"]),
                "buckets": tuple(w(b) for b in base["buckets"]),
            }

        if self._halo_caps is None:
            self._halo_caps = widen(partition_halo(batch, ndev).caps())
        try:
            return partition_halo(batch, ndev, caps=self._halo_caps)
        except ValueError:
            need = partition_halo(batch, ndev).caps()
            grown = widen(need)
            self._halo_caps = {
                k: (
                    tuple(
                        max(a, b)
                        for a, b in zip(self._halo_caps[k], grown[k])
                    )
                    if k == "buckets"
                    else max(self._halo_caps[k], grown[k])
                )
                for k in self._halo_caps
            }
            return partition_halo(batch, ndev, caps=self._halo_caps)

    def _partition_hybrid_pinned(self, group):
        """partition_hybrid with run-pinned, overflow-regrowing caps (the
        2D analogue of _partition_halo_pinned; capacities are shared by
        every group of the run)."""
        from molkgnn_tpu.parallel.halo import partition_halo
        from molkgnn_tpu.parallel.hybrid import partition_hybrid

        nm = int(self.mesh.shape["model"])
        margin = 1.5

        def widen(base):
            w = lambda v: int(-(-int(v * margin) // 8) * 8)
            return {
                "ns": base["ns"],
                "hp": w(base["hp"]),
                "el": w(base["el"]),
                "eh": w(base["eh"]),
                "buckets": tuple(w(b) for b in base["buckets"]),
            }

        def union(a, b):
            return {
                k: (
                    tuple(max(x, y) for x, y in zip(a[k], b[k]))
                    if k == "buckets"
                    else max(a[k], b[k])
                )
                for k in a
            }

        if self._hybrid_caps is None:
            caps = None
            for g in group:
                c = widen(partition_halo(g, nm).caps())
                caps = c if caps is None else union(caps, c)
            self._hybrid_caps = caps
        try:
            return partition_hybrid(group, nm, caps=self._hybrid_caps)
        except ValueError:
            for g in group:
                self._hybrid_caps = union(
                    self._hybrid_caps, widen(partition_halo(g, nm).caps())
                )
            return partition_hybrid(group, nm, caps=self._hybrid_caps)

    def _predict_hybrid(self, graphs) -> tuple[np.ndarray, np.ndarray]:
        """Hybrid 2D evaluation: nd eval batches per dispatch through the
        full-model forward; the last group is padded by repeating its
        final batch (duplicate rows discarded), one readback at the end."""
        nd = int(self.mesh.shape["data"])
        key = self._eval_cache_key("hybrid", graphs)
        hit = self._eval_part_cache.get(key)
        if hit is None or hit[0] != repr(self._hybrid_caps):
            batches = list(
                GraphLoader(
                    graphs, self.spec, self.config.batch_size, shuffle=False,
                )
            )
            groups = []
            for start in range(0, len(batches), nd):
                grp = batches[start : start + nd]
                full = grp + [grp[-1]] * (nd - len(grp))
                groups.append(
                    (self._partition_hybrid_pinned(full), len(grp))
                )
            hit = (
                repr(self._hybrid_caps),
                groups,
                np.concatenate([np.asarray(b.graph_mask) for b in batches]),
                np.concatenate([np.asarray(b.y) for b in batches]),
            )
            self._eval_cache_put(key, hit)
        _, groups, mask, trues = hit
        dev_preds = []
        for hb, n_real in groups:
            out = self._hybrid_eval(
                self.state.params, self.state.batch_stats, hb
            )  # [nd, B]
            dev_preds.extend(out[i] for i in range(n_real))
        all_pred = np.asarray(jnp.concatenate(dev_preds))
        return trues[mask], all_pred[mask]

    # Bound the partition cache to the run's eval splits (valid, test,
    # optionally train) — each entry pins a full split's partitioned
    # HaloBatches in host RAM, which at real-AID scale is 100s of MB.
    _EVAL_CACHE_MAX = 3

    def _eval_cache_key(self, kind, graphs):
        idxs = tuple(g.idx for g in graphs)
        if any(i < 0 for i in idxs):
            # idx defaults to -1 for user-built graphs: two same-length
            # splits would collide and silently swap predictions. No
            # reliable identity -> no caching.
            return None
        return (kind, idxs)

    def _eval_cache_put(self, key, hit):
        if key is None:
            return
        if (
            key not in self._eval_part_cache
            and len(self._eval_part_cache) >= self._EVAL_CACHE_MAX
        ):
            self._eval_part_cache.pop(next(iter(self._eval_part_cache)))
        self._eval_part_cache[key] = hit

    def _predict_halo(self, graphs) -> tuple[np.ndarray, np.ndarray]:
        """Model-parallel evaluation: each eval batch goes through the
        halo-partitioned full-model forward (same pinned capacities as
        training); logits are replicated, one readback at the end. The
        split's partitions are cached for the run (see
        ``_eval_part_cache``)."""
        key = self._eval_cache_key("halo", graphs)
        hit = self._eval_part_cache.get(key)
        if hit is None or hit[0] != repr(self._halo_caps):
            loader = GraphLoader(
                graphs, self.spec, self.config.batch_size, shuffle=False,
            )
            batches = list(loader)
            parts = [self._partition_halo_pinned(b) for b in batches]
            hit = (
                repr(self._halo_caps),
                parts,
                np.concatenate([np.asarray(b.graph_mask) for b in batches]),
                np.concatenate([np.asarray(b.y) for b in batches]),
            )
            self._eval_cache_put(key, hit)
        _, parts, mask, trues = hit
        dev_preds = [
            self._halo_eval(self.state.params, self.state.batch_stats, hb)
            for hb in parts
        ]
        all_pred = np.asarray(jnp.concatenate(dev_preds))
        return trues[mask], all_pred[mask]

    def _predict(self, graphs) -> tuple[np.ndarray, np.ndarray]:
        loader = GraphLoader(
            graphs, self.spec, self.config.batch_size, shuffle=False,
            collate=self.collate,
        )
        # Keep per-batch predictions on device and read back ONCE at the
        # end: first-touch D2H readbacks are seconds-slow on tunneled TPUs
        # (see ARCHITECTURE.md), so per-batch np.asarray would dominate
        # evaluation. Masks/labels come from the host-side batch.
        dev_preds, masks, trues = [], [], []
        for batch in loader:
            dev_preds.append(
                self._eval_step(self.state.params, self.state.batch_stats, batch)
            )
            masks.append(np.asarray(batch.graph_mask))
            trues.append(np.asarray(batch.y))
        all_pred = np.asarray(jnp.concatenate(dev_preds))
        mask = np.concatenate(masks)
        return np.concatenate(trues)[mask], all_pred[mask]

    def evaluate(self, part: str = "valid") -> Dict[str, float]:
        if self._halo_step is not None:
            true_y, pred_y = self._predict_halo(self.dataset.subset(part))
        elif self._hybrid_step is not None:
            true_y, pred_y = self._predict_hybrid(self.dataset.subset(part))
        elif self._device_data is not None:
            true_y, pred_y = self._predict_ids(
                np.asarray(self.dataset.split[part])
            )
        else:
            true_y, pred_y = self._predict(self.dataset.subset(part))
        results = compute_metrics(self.dataset.metrics, true_y, pred_y)
        # loss on device formula, host-evaluated
        results["loss"] = float(
            self.loss_fn(
                jnp.asarray(pred_y),
                jnp.asarray(true_y),
                jnp.ones_like(jnp.asarray(pred_y)),
            )
        )
        return results

    # ------------------------------------------------------------------
    def fit(self) -> List[Dict[str, float]]:
        """Train for max_epochs. With ``config.autosave_path`` set, fit is
        PREEMPTION-SAFE: it resumes from an existing autosave (full state +
        history; epochs already done are not re-run), autosaves after every
        epoch, and converts SIGTERM/SIGINT into finish-epoch + autosave +
        early return (tests/test_training.py::test_fit_preemption_*)."""
        import signal as _signal

        cfg = self.config
        start_epoch = 0
        if cfg.autosave_path and os.path.exists(
            cfg.autosave_path + ".state.msgpack"
        ):
            self.load_state(cfg.autosave_path)
            hpath = cfg.autosave_path + ".history.json"
            if os.path.exists(hpath):
                with open(hpath) as f:
                    self.history = json.load(f)
            start_epoch = len(self.history)
        stop = {"flag": False}
        old_handlers = {}
        if cfg.autosave_path:
            def _request_stop(signum, frame):
                stop["flag"] = True

            for sig in (_signal.SIGTERM, _signal.SIGINT):
                try:
                    old_handlers[sig] = _signal.signal(sig, _request_stop)
                except ValueError:
                    pass  # not the main thread; signals handled elsewhere
        try:
            return self._fit_loop(start_epoch, stop)
        finally:
            for sig, h in old_handlers.items():
                _signal.signal(sig, h)

    def _run_sample_epoch(self, steps: int, losses: list) -> None:
        """One device-sampled epoch: ``steps`` optimizer steps in
        scan_steps-sized fused dispatches (plus one remainder program),
        zero per-step host input. Shared by the single-device, DP, halo,
        and hybrid fit branches — only the step budget differs."""
        tids, table = self._sample_consts
        k = max(self.config.scan_steps, 1)
        nblocks, rem = divmod(steps, k)
        for _ in range(nblocks):
            self.state, loss_k, _ = self._train_steps_sample(k)(
                self.state, self._device_data, tids, table
            )
            losses.append(loss_k)
        if rem:
            self.state, loss_r, _ = self._train_steps_sample(rem)(
                self.state, self._device_data, tids, table
            )
            losses.append(loss_r)

    def _fit_loop(self, start_epoch, stop) -> List[Dict[str, float]]:
        cfg = self.config
        train_graphs = self.dataset.subset("train")
        loader = GraphLoader(
            train_graphs,
            self.spec,
            cfg.batch_size,
            shuffle=not cfg.oversample,
            oversample=cfg.oversample,
            seed=cfg.seed,
            collate=self.collate,
        )
        os.makedirs(cfg.log_dir, exist_ok=True)
        ndev = int(np.prod(list(self.mesh.shape.values()))) if self.mesh else 1
        steps_per_epoch = -(-len(self.dataset.split["train"]) // cfg.batch_size)
        if (
            ndev > 1
            and self.config.model_parallel is None
            and steps_per_epoch < ndev
        ):
            raise ValueError(
                f"data-parallel fit() needs at least one id-batch per device:"
                f" ceil(n_train/batch_size) = {steps_per_epoch} <"
                f" {ndev} devices. Shrink the mesh or the batch size."
            )
        for epoch in range(start_epoch, cfg.max_epochs):
            t0 = time.time()
            losses = []
            if self._halo_step is not None:
                if cfg.device_sampling:
                    # Device-resident halo epoch: zero per-step host input
                    # (halo_sample_steps); same optimizer-step budget as
                    # the host-fed path below.
                    self._run_sample_epoch(steps_per_epoch, losses)
                else:
                    # Model-parallel (halo) training: every batch is node-
                    # sharded over the whole mesh; one optimizer step per
                    # batch, same global-batch semantics as single device.
                    for batch in loader:
                        self.state, loss = self._halo_step(
                            self.state, self._partition_halo_pinned(batch)
                        )
                        losses.append(loss)
            elif self._hybrid_step is not None:
                nd = int(self.mesh.shape["data"])
                if cfg.device_sampling:
                    # Device-resident hybrid epoch: each step consumes
                    # nd*B on-device draws (same global-batch semantics
                    # and step budget as the host-fed grouping below).
                    self._run_sample_epoch(max(steps_per_epoch // nd, 1), losses)
                else:
                    # Hybrid 2D training: nd loader batches per optimizer
                    # step (global batch nd*B), each node-sharded over its
                    # model row. The trailing partial group is dropped
                    # (resampled next epoch), matching the DP path.
                    group = []
                    for batch in loader:
                        group.append(batch)
                        if len(group) == nd:
                            self.state, loss = self._hybrid_step(
                                self.state,
                                self._partition_hybrid_pinned(group),
                            )
                            losses.append(loss)
                            group = []
            elif self.mesh is None and self._device_data is not None:
                if cfg.device_sampling:
                    # Zero-host-input epoch: same OPTIMIZER-STEP budget
                    # as the host sampler; the remainder block is a full
                    # unmasked batch, so up to B-1 extra i.i.d. draws per
                    # epoch (distribution unchanged). Only the loss
                    # vectors come back.
                    self._run_sample_epoch(steps_per_epoch, losses)
                elif cfg.scan_steps > 1:
                    blocks = np.stack(list(self._epoch_id_batches(cfg)))
                    k = cfg.scan_steps
                    whole = (blocks.shape[0] // k) * k
                    for start in range(0, whole, k):
                        self.state, loss_k = self._train_steps_scan(
                            self.state,
                            self._device_data,
                            blocks[start : start + k],
                        )
                        losses.append(loss_k)
                    for ids in blocks[whole:]:
                        self.state, loss = self._train_step_ids(
                            self.state, self._device_data, ids
                        )
                        losses.append(loss)
                else:
                    for ids in self._epoch_id_batches(cfg):
                        self.state, loss = self._train_step_ids(
                            self.state, self._device_data, ids
                        )
                        losses.append(loss)
            elif self.mesh is None:
                from molkgnn_tpu.data.prefetch import prefetch_to_device

                for batch in prefetch_to_device(loader):
                    self.state, loss = self._train_step(self.state, batch)
                    losses.append(loss)
            elif self._device_data is not None and cfg.device_sampling:
                # Device-sampled DP: every chip draws its own ids per step
                # (zero per-step host input at any device count); same
                # optimizer-step budget as the host DP path (its trailing
                # sub-ndev remainder is dropped there too).
                self._run_sample_epoch(max(steps_per_epoch // ndev, 1), losses)
            elif self._device_data is not None:
                # Device-resident DP: each optimizer step consumes ndev
                # sub-batches of B ids (global batch = ndev*B, same
                # semantics as the host-loader DP path); K steps fuse per
                # dispatch. The trailing sub-ndev remainder is dropped
                # (resampled next epoch), matching the host DP path.
                steps_ids = np.stack(list(self._epoch_id_batches(cfg)))
                whole = (steps_ids.shape[0] // ndev) * ndev
                groups = steps_ids[:whole].reshape(
                    -1, ndev, cfg.batch_size
                )  # [G, ndev, B]
                k = max(cfg.scan_steps, 1)
                gwhole = (groups.shape[0] // k) * k
                for start in range(0, gwhole, k):
                    self.state, loss_k = self._train_steps_scan_dp(
                        self.state,
                        self._device_data,
                        groups[start : start + k],
                    )
                    losses.append(loss_k)
                for group in groups[gwhole:]:
                    self.state, loss_1 = self._train_steps_scan_dp(
                        self.state, self._device_data, group[None]
                    )
                    losses.append(loss_1)
            else:
                # DP: group ndev sub-batches per step; the trailing partial
                # group is dropped (oversampling resamples every epoch, so
                # no molecule is systematically skipped).
                from molkgnn_tpu.parallel.data_parallel import stack_shards

                group = []
                for batch in loader:
                    group.append(batch)
                    if len(group) == ndev:
                        self.state, loss = self._train_step(
                            self.state, stack_shards(group)
                        )
                        losses.append(loss)
                        group = []
            # One device->host readback per epoch (readbacks are expensive
            # on tunneled TPUs), not one per step. Scan blocks contribute
            # [K]-shaped loss vectors; singles are scalars.
            if not losses:
                raise RuntimeError(
                    "fit(): epoch produced no optimizer steps (train split "
                    "too small for the batch size / device count)"
                )
            t_dispatch = time.time()
            train_loss = float(
                jnp.mean(jnp.concatenate([jnp.atleast_1d(l) for l in losses]))
            )
            t_readback = time.time()

            results = self.evaluate("valid")
            if cfg.record_valid_pred:
                if self._halo_step is not None:
                    true_y, pred_y = self._predict_halo(
                        self.dataset.subset("valid")
                    )
                elif self._hybrid_step is not None:
                    true_y, pred_y = self._predict_hybrid(
                        self.dataset.subset("valid")
                    )
                elif self._device_data is not None:
                    true_y, pred_y = self._predict_ids(
                        np.asarray(self.dataset.split["valid"])
                    )
                else:
                    true_y, pred_y = self._predict(self.dataset.subset("valid"))
                pred_dir = os.path.join(cfg.log_dir, "valid_predictions")
                os.makedirs(pred_dir, exist_ok=True)
                with open(os.path.join(pred_dir, f"epoch_{epoch}"), "w") as f:
                    for pv, tv in zip(pred_y, true_y):
                        f.write(f"{pv},{tv}\n")
            if cfg.train_metric:
                for k, v in self.evaluate("train").items():
                    results[f"{k}_no_dropout"] = v
            results["train_loss"] = train_loss
            results["epoch"] = epoch
            results["epoch_time_s"] = time.time() - t0
            # Wall-time breakdown (VERDICT r3 item 3): dispatching the
            # epoch's train programs, the single loss readback that drains
            # them (on an async backend the device work itself lands
            # here), and evaluation incl. metric readbacks.
            results["train_dispatch_time_s"] = t_dispatch - t0
            results["train_readback_time_s"] = t_readback - t_dispatch
            results["eval_time_s"] = time.time() - t_readback
            self.history.append(results)
            if self.monitor is not None:
                self.monitor.on_epoch_end(epoch, results)
            self._update_checkpoints(results)
            if cfg.progress:
                shown = {
                    k: round(v, 4)
                    for k, v in results.items()
                    if isinstance(v, float)
                }
                print(f"epoch {epoch}: {shown}", flush=True)
            if cfg.autosave_path:
                self.save_state(cfg.autosave_path)
                with open(cfg.autosave_path + ".history.json", "w") as f:
                    json.dump(self.history, f)
            if stop["flag"]:
                if cfg.progress:
                    print(
                        f"fit: stop signal received; autosaved after "
                        f"epoch {epoch}, returning early",
                        flush=True,
                    )
                break
        self._save_checkpoint("last")
        with open(os.path.join(cfg.log_dir, "history.json"), "w") as f:
            json.dump(self.history, f, indent=1)
        return self.history

    # ------------------------------------------------------------------
    def _update_checkpoints(self, results: Dict[str, float]):
        for monitor in self.config.monitors:
            if monitor not in results:
                continue
            value = results[monitor]
            better = (
                value < self.best.get(monitor, np.inf)
                if monitor == "loss"
                else value > self.best.get(monitor, -np.inf)
            )
            if better:
                self.best[monitor] = value
                self._save_checkpoint(f"best_{monitor}")

    def _save_checkpoint(self, tag: str):
        payload = {
            "step": self.state.step,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        self._ckpts[tag] = jax.tree.map(np.asarray, payload)
        if self.config.checkpoint_dir:
            from molkgnn_tpu.training.checkpoint import save_checkpoint

            save_checkpoint(
                os.path.join(self.config.checkpoint_dir, tag), payload
            )

    def load_checkpoint_tag(self, tag: str):
        ck = self._ckpts[tag]
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, ck["params"]),
            batch_stats=jax.tree.map(jnp.asarray, ck["batch_stats"]),
        )

    # ------------------------------------------------------------------
    def save_state(self, path: str) -> None:
        """Full-state checkpoint (params, batch stats, optimizer state,
        RNG, step, best-metric table) for mid-training resume — a framework
        extension beyond the reference's eval-time-only checkpoints
        (SURVEY §5: "No mid-epoch resume")."""
        from flax import serialization

        payload = {
            "step": self.state.step,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "rng": jax.random.key_data(self.state.rng),
            "epochs_done": np.asarray(len(self.history)),
            "best": {k: np.asarray(v) for k, v in self.best.items()},
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path + ".state.msgpack", "wb") as f:
            f.write(serialization.to_bytes(payload))

    def load_state(self, path: str) -> None:
        from flax import serialization

        # Restore INTO the live structures so optax NamedTuple states and
        # param pytrees keep their exact types (flax state-dict matching).
        target = {
            "step": self.state.step,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "rng": jax.random.key_data(self.state.rng),
            "epochs_done": np.asarray(0),
            "best": {},
        }
        with open(path + ".state.msgpack", "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        target["best"] = raw.get("best", {})
        ck = serialization.from_state_dict(target, raw)
        self.state = self.state.replace(
            step=jnp.asarray(ck["step"], jnp.int32),
            params=jax.tree.map(jnp.asarray, ck["params"]),
            batch_stats=jax.tree.map(jnp.asarray, ck["batch_stats"]),
            opt_state=ck["opt_state"],
            rng=jax.random.wrap_key_data(jnp.asarray(ck["rng"])),
        )
        self.best = {k: float(v) for k, v in ck.get("best", {}).items()}

    def save_kernels(self, out_dir: str):
        """Dump the first layer's learned kernels (reference
        model.py:417-431 saves layer-0 trainable_kernelconv_set) for the
        interpretability analyses (analyses/kernel_reader)."""
        os.makedirs(out_dir, exist_ok=True)
        params = self.state.params
        layer0 = (
            params.get("encoder", params)
            .get("gnn", {})
            .get("layer0", None)
        )
        if layer0 is None:
            raise ValueError("save_kernels: model has no kgnn layer0")
        flat = {}
        for conv_name, conv in layer0.items():
            for pname, val in conv.items():
                flat[f"{conv_name}/{pname}"] = np.asarray(val)
        np.savez(os.path.join(out_dir, "kernels.npz"), **flat)

    def save_graph_embedding(self, out_dir: str, part: str = "test"):
        """Save graph embeddings + smiles for a split (reference
        model.py:409-415)."""
        os.makedirs(out_dir, exist_ok=True)
        graphs = self.dataset.subset(part)
        loader = GraphLoader(
            graphs, self.spec, self.config.batch_size, shuffle=False,
            collate=self.collate,
        )
        dev_embs, masks = [], []
        for batch in loader:
            _, emb = self.model.apply(
                {
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                },
                batch,
                train=False,
            )
            dev_embs.append(emb)
            masks.append(np.asarray(batch.graph_mask))
        all_emb = np.asarray(jnp.concatenate(dev_embs))
        np.save(
            os.path.join(out_dir, "graph_embedding.npy"),
            all_emb[np.concatenate(masks)],
        )
        with open(
            os.path.join(out_dir, "smiles_for_graph_embedding.txt"), "w"
        ) as f:
            for g in graphs:
                f.write(getattr(g, "smiles", "") + "\n")

    def test(self) -> Dict[str, Dict[str, float]]:
        """Evaluate last + each best checkpoint on the test split, writing
        the reference's test_result.log / test_sample_scores.log records
        (entry.py:156-182)."""
        cfg = self.config
        out: Dict[str, Dict[str, float]] = {}
        tags = [
            t
            for t in ["last"] + [f"best_{m}" for m in cfg.monitors]
            if t in self._ckpts
        ]
        saved_state = self.state
        for tag in tags:
            self.load_checkpoint_tag(tag)
            # Same device-resident eval path as evaluate(): ids-only H2D,
            # one readback per checkpoint (no host-loader re-collation).
            if self._halo_step is not None:
                true_y, pred_y = self._predict_halo(
                    self.dataset.subset("test")
                )
            elif self._hybrid_step is not None:
                true_y, pred_y = self._predict_hybrid(
                    self.dataset.subset("test")
                )
            elif self._device_data is not None:
                true_y, pred_y = self._predict_ids(
                    np.asarray(self.dataset.split["test"])
                )
            else:
                true_y, pred_y = self._predict(self.dataset.subset("test"))
            out[tag] = compute_metrics(self.dataset.metrics, true_y, pred_y)
            scores_path = os.path.join(
                cfg.log_dir, f"test_sample_scores_{tag}.log"
            )
            os.makedirs(cfg.log_dir, exist_ok=True)
            with open(scores_path, "w") as f:
                for p, t in zip(pred_y, true_y):
                    f.write(f"{p},{t}\n")
        self.state = saved_state
        with open(os.path.join(cfg.log_dir, "test_result.log"), "w") as f:
            for tag, metrics in out.items():
                f.write(f"[{tag}]\n")
                for k, v in metrics.items():
                    f.write(f"{k}: {v}\n")
        return out
