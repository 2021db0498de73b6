"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
from molkgnn_tpu.graphs import spec_for_graphs
from molkgnn_tpu.models import MolKGNNNet
from molkgnn_tpu.parallel import make_mesh, stack_shards
from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer


def _setup(mesh=None, batch_size=4):
    ds = make_synthetic_dataset(seed=9, num_graphs=64, active_fraction=0.3)
    spec = spec_for_graphs(ds.graphs, batch_size=batch_size)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=2,
            kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=batch_size,
        max_epochs=1,
        warmup_iterations=5,
        oversample=False,
        progress=False,
    )
    trainer = Trainer(model, ds, spec, cfg, mesh=mesh)
    return ds, spec, trainer


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_step_replicates_and_matches_single_device():
    mesh = make_mesh(2)
    ds, spec, dp_trainer = _setup(mesh=mesh)
    _, _, sd_trainer = _setup(mesh=None)

    batch = next(iter(GraphLoader(ds.subset("train"), spec, 4, seed=0)))
    # Same sub-batch on both shards => pmean(grads) == local grads ==
    # the single-device step on that sub-batch.
    stacked = stack_shards([batch, batch])

    dp_state, dp_loss = dp_trainer._train_step(dp_trainer.state, stacked)
    sd_state, sd_loss = sd_trainer._train_step(sd_trainer.state, batch)

    np.testing.assert_allclose(float(dp_loss), float(sd_loss), rtol=1e-6)
    for dp_leaf, sd_leaf in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(sd_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(dp_leaf), np.asarray(sd_leaf), rtol=1e-5, atol=1e-7
        )


def test_dp_fit_epoch_runs_on_8_devices():
    mesh = make_mesh(8)
    ds, spec, trainer = _setup(mesh=mesh, batch_size=2)
    history = trainer.fit()
    assert len(history) == 1
    assert np.isfinite(history[0]["train_loss"])


def test_dp_device_sampling_fit_runs_and_is_deterministic():
    """Device-sampled DP fit (zero per-step host input, each chip drawing
    its own ids) runs on a 4-device mesh, advances the step counter by the
    host DP path's optimizer-step budget, and reproduces per seed."""

    def run():
        ds = make_synthetic_dataset(seed=9, num_graphs=64, active_fraction=0.3)
        spec = spec_for_graphs(ds.graphs, batch_size=4)
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=1,
                kernels_1hop=(2, 3, 4, 5),
                kernels_nhop=(2, 3, 4, 5),
                graph_embedding_dim=8,
            ),
            ffn_dropout_rate=0.0,
        )
        cfg = TrainConfig(
            batch_size=4, max_epochs=2, warmup_iterations=5,
            oversample=True, device_sampling=True, scan_steps=2,
            progress=False,
        )
        trainer = Trainer(model, ds, spec, cfg, mesh=make_mesh(4))
        return trainer, trainer.fit()

    t1, h1 = run()
    # 51 train graphs / batch 4 -> 13 id-batches -> 13 // 4 devices = 3
    # optimizer steps/epoch (host DP drops the remainder group too);
    # scan_steps=2 -> one 2-block + one remainder-1 program.
    steps_per_epoch = -(-len(t1.dataset.split["train"]) // 4) // 4
    assert int(np.asarray(t1.state.step)) == 2 * steps_per_epoch
    assert all(np.isfinite(h["train_loss"]) for h in h1)
    t2, h2 = run()
    assert [h["train_loss"] for h in h1] == [h["train_loss"] for h in h2]


def test_dp_device_data_scan_matches_single_device_scan():
    """shard_scan_steps on 2 devices fed IDENTICAL ids per shard must equal
    the single-device scan path step-for-step (pmean of equal grads is a
    no-op), proving the device-resident DP path changes only the dispatch,
    not the math."""
    mesh = make_mesh(2)
    ds, spec, dp_trainer = _setup(mesh=mesh)
    _, _, sd_trainer = _setup(mesh=None)
    assert dp_trainer._device_data is not None
    assert hasattr(dp_trainer, "_train_steps_scan_dp")

    rng = np.random.default_rng(3)
    k = 3
    ids = rng.integers(0, 64, size=(k, 4)).astype(np.int32)  # [K, B]
    # Same ids on both shards: [K, ndev, B].
    dp_block = np.broadcast_to(ids[:, None, :], (k, 2, 4)).copy()

    dp_state, dp_loss = dp_trainer._train_steps_scan_dp(
        dp_trainer.state, dp_trainer._device_data, dp_block
    )
    sd_state, sd_loss = sd_trainer._train_steps_scan(
        sd_trainer.state, sd_trainer._device_data, ids
    )

    np.testing.assert_allclose(
        np.asarray(dp_loss), np.asarray(sd_loss), rtol=1e-6
    )
    for dp_leaf, sd_leaf in zip(
        jax.tree.leaves(dp_state.params), jax.tree.leaves(sd_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(dp_leaf), np.asarray(sd_leaf), rtol=1e-5, atol=1e-7
        )


def test_dp_scan_chunk_matches_flat_dp_scan():
    """The nested (K//chunk x chunk) DP scan (shard_scan_steps chunk=...)
    must equal the flat DP scan step-for-step — the multi-chip twin of
    tests/test_training.py::test_scan_chunk_matches_flat_scan."""
    mesh = make_mesh(2)
    _, _, flat_tr = _setup(mesh=mesh)
    _, _, nest_tr = _setup(mesh=mesh)
    nest_tr.config.scan_chunk = 2
    from molkgnn_tpu.parallel.data_parallel import shard_scan_steps

    nest_prog = shard_scan_steps(
        nest_tr._train_step_fn, nest_tr._gather_fn, nest_tr.spec, mesh,
        chunk=2,
    )

    rng = np.random.default_rng(4)
    k = 4
    dp_block = rng.integers(0, 64, size=(k, 2, 4)).astype(np.int32)
    f_state, f_loss = flat_tr._train_steps_scan_dp(
        flat_tr.state, flat_tr._device_data, dp_block
    )
    n_state, n_loss = nest_prog(
        nest_tr.state, nest_tr._device_data, dp_block
    )
    np.testing.assert_allclose(
        np.asarray(n_loss), np.asarray(f_loss), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(f_state.params), jax.tree.leaves(n_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_dp_device_data_fit_epoch_runs_and_evaluates():
    mesh = make_mesh(4)
    ds, spec, trainer = _setup(mesh=mesh, batch_size=2)
    trainer.config.scan_steps = 2
    history = trainer.fit()
    assert len(history) == 1
    assert np.isfinite(history[0]["train_loss"])
    assert np.isfinite(history[0]["loss"])


def test_dp_eval_matches_single_device_eval():
    """r5: evaluation shards its id-block matrix over the DP mesh
    (each chip scores its own blocks under shard_map) — predictions must
    equal the single-device eval scan's exactly, including a block count
    that is not a device multiple (masked all-pad blocks)."""
    mesh = make_mesh(4)
    _, _, dp_trainer = _setup(mesh=mesh)
    _, _, sd_trainer = _setup(mesh=None)
    # 14 graphs / b4 -> 4 blocks (ragged tail) -> padded to 4-multiple.
    ids = np.arange(3, 17, dtype=np.int64)
    dp_true, dp_pred = dp_trainer._predict_ids(ids)
    sd_true, sd_pred = sd_trainer._predict_ids(ids)
    np.testing.assert_array_equal(dp_true, sd_true)
    np.testing.assert_allclose(dp_pred, sd_pred, rtol=2e-5, atol=1e-6)
    # Regression (r5): the DP eval program's [K, ndev, B] feed contract
    # must hold at ANY device count — a 1-device mesh used to crash
    # because _eval_flat's reshape was gated on nd > 1.
    _, _, dp1_trainer = _setup(mesh=make_mesh(1))
    dp1_true, dp1_pred = dp1_trainer._predict_ids(ids)
    np.testing.assert_array_equal(dp1_true, sd_true)
    np.testing.assert_allclose(dp1_pred, sd_pred, rtol=2e-5, atol=1e-6)


def test_edge_partition_matches_single_device():
    """Edge/bucket-sharded forward over 4 devices == single-device forward.

    Uses a single kgnn layer: deeper nets develop bitwise-equal neighbor
    features (sibling hydrogens) whose permutation scores tie exactly, and
    fp tie-breaks then legitimately differ between compilations with
    different matmul tilings (sharded vs not) — the same instability any
    reshape/recompile has (documented in parallel/edge_partition.py).
    """
    from jax.sharding import Mesh

    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.parallel.edge_partition import (
        edge_parallel_forward,
        partition_batch,
    )
    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs

    ds = make_synthetic_dataset(seed=21, num_graphs=16)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    batch = next(iter(GraphLoader(ds.graphs[:8], spec, 8)))

    single = MolKGNNNet(
        num_layers=1, kernels_1hop=(2, 3, 4, 5), kernels_nhop=(2, 3, 4, 5),
        graph_embedding_dim=8,
    )
    variables = single.init(jax.random.key(0), batch)
    want = np.asarray(single.apply(variables, batch))

    sharded_model = MolKGNNNet(
        num_layers=1, kernels_1hop=(2, 3, 4, 5), kernels_nhop=(2, 3, 4, 5),
        graph_embedding_dim=8, psum_axis="graph",
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("graph",))
    part = partition_batch(batch, 4)
    got = np.asarray(
        edge_parallel_forward(sharded_model, mesh)(variables, part)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_multihost_helpers():
    from molkgnn_tpu.parallel.multihost import (
        global_data_mesh,
        host_shard,
        local_device_batches,
    )

    # Single-process semantics: full passthrough.
    items = list(range(10))
    assert host_shard(items, process_id=0, process_count=1) == items
    # 3-way static partition covers everything exactly once.
    parts = [host_shard(items, process_id=i, process_count=3) for i in range(3)]
    assert sum(parts, []) == items
    mesh = global_data_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    ids = np.arange(16).reshape(8, 2)
    local = local_device_batches(ids)
    assert local.shape == (8, 2)  # single process owns all 8 devices


def test_one_device_mesh_with_device_data_fits():
    """Regression (ADVICE r1): a 1-device mesh with use_device_data=True
    must train through the DP path instead of crashing on the missing
    single-device id-step attributes."""
    mesh = make_mesh(1)
    ds, spec, trainer = _setup(mesh=mesh, batch_size=4)
    assert trainer._device_data is not None
    assert hasattr(trainer, "_train_steps_scan_dp")
    history = trainer.fit()
    assert len(history) == 1
    assert np.isfinite(history[0]["train_loss"])


def test_dp_device_data_replicated_once():
    """Regression (ADVICE r1): the device-resident dataset must be placed
    with NamedSharding(mesh, P()) at construction, so dispatches don't pay a
    device0->mesh broadcast of the whole dataset every call."""
    from jax.sharding import NamedSharding

    mesh = make_mesh(4)
    _, _, trainer = _setup(mesh=mesh)
    for leaf in jax.tree.leaves(trainer._device_data):
        sh = leaf.sharding
        assert isinstance(sh, NamedSharding), sh
        assert sh.mesh.shape == mesh.shape
        assert sh.is_fully_replicated
    # The compiled scan-DP step must see those shardings as-is (no resharding
    # of the dataset on dispatch).
    ids = np.zeros((1, 4, 4), np.int32)
    compiled = trainer._train_steps_scan_dp.lower(
        trainer.state, trainer._device_data, ids
    ).compile()
    n_state = len(jax.tree.leaves(trainer.state))
    data_shardings = compiled.input_shardings[0][n_state : n_state + len(
        jax.tree.leaves(trainer._device_data)
    )]
    for want, got in zip(
        jax.tree.leaves(trainer._device_data), data_shardings
    ):
        assert want.sharding.is_equivalent_to(got, want.ndim)


def test_dp_fit_raises_on_too_few_batches():
    """Regression (ADVICE r1): fewer id-batches than devices must raise a
    clear error instead of training on nothing / crashing on an empty
    concatenate."""
    import pytest

    mesh = make_mesh(8)
    # 64-graph dataset, default 80% train split ~= 51 -> ceil(51/32) = 2 < 8.
    ds, spec, trainer = _setup(mesh=mesh, batch_size=32)
    with pytest.raises(ValueError, match="id-batch per device"):
        trainer.fit()


def test_halo_partition_matches_single_device():
    """Node-sharded halo-exchange forward (parallel/halo.py) == single-device
    forward. Contiguous node shards cut molecules mid-graph, so the halo is
    non-trivial (asserted); only boundary rows cross ICI, unlike the
    node-replicated psum design. Single kgnn layer for the same fp-tie
    reason as test_edge_partition_matches_single_device."""
    from jax.sharding import Mesh

    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.parallel.halo import (
        halo_parallel_forward,
        halo_stats,
        partition_halo,
    )

    ds = make_synthetic_dataset(seed=23, num_graphs=16)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    batch = next(iter(GraphLoader(ds.graphs[:8], spec, 8)))

    model = MolKGNNNet(
        num_layers=1, kernels_1hop=(2, 3, 4, 5), kernels_nhop=(2, 3, 4, 5),
        graph_embedding_dim=8,
    )
    variables = model.init(jax.random.key(0), batch)
    want = np.asarray(model.apply(variables, batch))

    hb = partition_halo(batch, 4)
    stats = halo_stats(hb)
    assert stats["halo_rows_per_exchange"] > 0, "no cross-shard traffic?"
    assert (
        stats["halo_rows_per_exchange"] < stats["replicated_alternative_rows"]
    ), f"halo not smaller than replication: {stats}"

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    got = np.asarray(
        halo_parallel_forward(model, mesh)(variables, hb)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_halo_partition_multilayer_matches_single_device():
    """3-layer halo forward (two exchanges per layer, h and sc) == single
    device, EXACTLY. Chain molecules: every node's neighborhood features are
    distinct at every layer, so no permutation-score ties exist and the
    cross-compilation argmax caveat does not apply (deg-4/chirality coverage
    lives in the 1-layer test above)."""
    from jax.sharding import Mesh

    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.graphs.batch import batch_graphs
    from molkgnn_tpu.graphs.molgraph import MolGraph
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.parallel.halo import halo_parallel_forward, partition_halo

    rng = np.random.default_rng(31)
    graphs = []
    for i in range(8):
        n = int(rng.integers(10, 16))
        ei, ea = [], []
        for u in range(n - 1):
            attr = rng.standard_normal(7).astype(np.float32)
            ei += [(u, u + 1), (u + 1, u)]
            ea += [attr, attr]
        g = MolGraph(
            x=rng.standard_normal((n, 28)).astype(np.float32),
            p=rng.standard_normal((n, 3)).astype(np.float32),
            edge_index=np.array(ei, np.int32).T,
            edge_attr=np.array(ea, np.float32),
            y=float(i % 2),
            atomic_num=rng.integers(1, 10, size=n).astype(np.int32),
        ).with_fields()
        graphs.append(g)

    spec = spec_for_graphs(graphs, batch_size=8)
    batch = batch_graphs(graphs, spec)
    model = MolKGNNNet(
        num_layers=3, kernels_1hop=(2, 3, 4, 5), kernels_nhop=(2, 3, 4, 5),
        graph_embedding_dim=8,
    )
    variables = model.init(jax.random.key(0), batch)
    want = np.asarray(model.apply(variables, batch))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    hb = partition_halo(batch, len(jax.devices()))
    got = np.asarray(halo_parallel_forward(model, mesh)(variables, hb))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _chain_graphs(seed, n_graphs=8, lo=10, hi=16):
    """Chain molecules with random features: every node's neighborhood is
    distinct at every layer, so no permutation-score ties exist and halo
    outputs/grads match the single-device path EXACTLY (not just up to fp
    tie-breaking)."""
    from molkgnn_tpu.graphs.molgraph import MolGraph

    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(lo, hi))
        ei, ea = [], []
        for u in range(n - 1):
            attr = rng.standard_normal(7).astype(np.float32)
            ei += [(u, u + 1), (u + 1, u)]
            ea += [attr, attr]
        graphs.append(
            MolGraph(
                x=rng.standard_normal((n, 28)).astype(np.float32),
                p=rng.standard_normal((n, 3)).astype(np.float32),
                edge_index=np.array(ei, np.int32).T,
                edge_attr=np.array(ea, np.float32),
                y=float(i % 2),
                atomic_num=rng.integers(1, 10, size=n).astype(np.int32),
            ).with_fields()
        )
    return graphs


def _assert_states_close(got_state, want_state, rtol=5e-5, atol=1e-6):
    """Post-AdamW-step state comparison. Tolerance note: unlike the DP test
    (pmean of bitwise-identical per-shard grads — exact), the halo step
    genuinely REORDERS fp reductions (per-shard partials pmean'd), so
    grads carry summation-order noise that Adam's first-step
    ~sign(g)-normalization can amplify on near-cancelling elements."""
    np.testing.assert_equal(
        int(np.asarray(got_state.step)), int(np.asarray(want_state.step))
    )
    for name, got_tree, want_tree in [
        ("params", got_state.params, want_state.params),
        ("batch_stats", got_state.batch_stats, want_state.batch_stats),
    ]:
        got_leaves = jax.tree.leaves(got_tree)
        want_leaves = jax.tree.leaves(want_tree)
        assert len(got_leaves) == len(want_leaves), name
        for g, w in zip(got_leaves, want_leaves):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=rtol, atol=atol
            )


def _tree_graphs(seed, n_graphs=8, lo=12, hi=18):
    """Random trees with max degree 4 and CONTINUOUS random features.

    Unlike make_synthetic_dataset (discrete atom-like features, where two
    identical neighbors tie permutation scores EXACTLY and the argmax then
    routes gradients to a compilation-dependent tied permutation), distinct
    features make per-element grads well-defined — while still exercising
    degrees 1-4 and the deg-4 chirality sign."""
    from molkgnn_tpu.graphs.molgraph import MolGraph

    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(lo, hi))
        deg = np.zeros(n, np.int64)
        ei, ea = [], []
        for v in range(1, n):
            # attach to a uniformly random earlier node with spare capacity
            cands = [u for u in range(v) if deg[u] < (4 if u == 0 else 3)]
            u = int(rng.choice(cands))
            attr = rng.standard_normal(7).astype(np.float32)
            ei += [(u, v), (v, u)]
            ea += [attr, attr]
            deg[u] += 1
            deg[v] += 1
        graphs.append(
            MolGraph(
                x=rng.standard_normal((n, 28)).astype(np.float32),
                p=rng.standard_normal((n, 3)).astype(np.float32),
                edge_index=np.array(ei, np.int32).T,
                edge_attr=np.array(ea, np.float32),
                y=float(i % 2),
                atomic_num=rng.integers(1, 10, size=n).astype(np.int32),
            ).with_fields()
        )
    return graphs


def test_halo_train_step_matches_single_device():
    """VERDICT r2 item 1: ONE full training step through the halo partition
    (loss, grads across both all_to_all exchanges, psum'd encoder grads,
    AdamW update, train-mode BN stats) == the single-device Trainer step on
    the same batch, to the DP-test tolerance. Single kgnn layer, random
    trees: degrees 1-4 + chirality exercised with NO tied permutation
    scores (see _tree_graphs)."""
    from molkgnn_tpu.data.dataset import Dataset
    from molkgnn_tpu.parallel.halo import halo_train_step, partition_halo

    graphs = _tree_graphs(seed=41, n_graphs=16)
    ds = Dataset(
        name="trees",
        graphs=graphs,
        split={
            "train": np.arange(12),
            "valid": np.arange(12, 14),
            "test": np.arange(14, 16),
        },
        metrics=["AUC"],
        loss_name="bce_with_logits",
    )
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1,
            kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_epochs=1, warmup_iterations=5,
        oversample=False, progress=False, use_device_data=False,
    )
    trainer = Trainer(model, ds, spec, cfg)
    batch = next(iter(GraphLoader(ds.graphs[:8], spec, 8)))
    # Chirality must actually be exercised: the trees need deg-4 nodes.
    assert int(np.asarray(batch.deg4.mask).sum()) > 0

    state_sd = jax.tree.map(jnp.array, trainer.state)  # private copies:
    state_h = jax.tree.map(jnp.array, trainer.state)  # both steps donate
    sd_state, sd_loss = trainer._train_step(state_sd, batch)

    mesh = make_mesh(4)
    hb = partition_halo(batch, 4)
    step = halo_train_step(model, trainer.tx, mesh)
    h_state, h_loss = step(state_h, hb)

    np.testing.assert_allclose(float(h_loss), float(sd_loss), rtol=1e-6)
    _assert_states_close(h_state, sd_state)


def test_halo_train_steps_multilayer_match_single_device():
    """Two consecutive halo train steps on a 3-layer model (two exchanges
    per layer, gradients crossing SIX all_to_alls per direction) track the
    single-device Trainer step-for-step: params, BN running stats, and
    losses all match. Chain molecules — no permutation-score ties."""
    from molkgnn_tpu.graphs.batch import batch_graphs
    from molkgnn_tpu.data.dataset import Dataset
    from molkgnn_tpu.parallel.halo import (
        halo_stats,
        halo_train_step,
        partition_halo,
    )

    graphs = _chain_graphs(seed=37, n_graphs=16)
    spec = spec_for_graphs(graphs, batch_size=8)
    ds = Dataset(
        name="chains",
        graphs=graphs,
        split={
            "train": np.arange(12),
            "valid": np.arange(12, 14),
            "test": np.arange(14, 16),
        },
        metrics=["AUC"],
        loss_name="bce_with_logits",
    )
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=3,
            kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_epochs=1, warmup_iterations=5,
        oversample=False, progress=False, use_device_data=False,
    )
    trainer = Trainer(model, ds, spec, cfg)
    batch_a = batch_graphs(graphs[:8], spec)
    batch_b = batch_graphs(graphs[8:16], spec)

    mesh = make_mesh(8)
    hb_a = partition_halo(batch_a, 8)
    # Pin the second batch to the first's capacities: ONE compiled program
    # for the whole run (production-loader contract, VERDICT r2 item 1).
    caps = {
        k: (
            tuple(max(x, y) for x, y in zip(hb_a.caps()[k], v))
            if k == "buckets"
            else max(hb_a.caps()[k], v)
        )
        for k, v in partition_halo(batch_b, 8).caps().items()
    }
    hb_a = partition_halo(batch_a, 8, caps=caps)
    hb_b = partition_halo(batch_b, 8, caps=caps)
    assert halo_stats(hb_a)["halo_rows_per_exchange"] > 0

    state_sd = jax.tree.map(jnp.array, trainer.state)
    state_h = jax.tree.map(jnp.array, trainer.state)
    step = halo_train_step(model, trainer.tx, mesh)
    for batch, hb in [(batch_a, hb_a), (batch_b, hb_b)]:
        state_sd, sd_loss = trainer._train_step(state_sd, batch)
        state_h, h_loss = step(state_h, hb)
        np.testing.assert_allclose(
            float(h_loss), float(sd_loss), rtol=1e-6
        )
    _assert_states_close(state_h, state_sd)


def test_halo_partition_pinned_caps_share_shapes():
    """partition_halo(caps=...) must give every batch identical array
    shapes (one jit program per run) and raise on overflow."""
    import pytest

    from molkgnn_tpu.parallel.halo import partition_halo

    ds = make_synthetic_dataset(seed=43, num_graphs=32)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    loader = iter(GraphLoader(ds.graphs, spec, 8))
    b1, b2 = next(loader), next(loader)
    caps = {
        k: (
            tuple(max(x, y) for x, y in zip(partition_halo(b1, 4).caps()[k], v))
            if k == "buckets"
            else max(partition_halo(b1, 4).caps()[k], v)
        )
        for k, v in partition_halo(b2, 4).caps().items()
    }
    h1 = partition_halo(b1, 4, caps=caps)
    h2 = partition_halo(b2, 4, caps=caps)
    s1 = jax.tree.map(lambda a: np.asarray(a).shape, h1)
    s2 = jax.tree.map(lambda a: np.asarray(a).shape, h2)
    assert s1 == s2
    tight = dict(caps, hp=0)
    with pytest.raises(ValueError, match="hp"):
        partition_halo(b1, 4, caps=tight)


def test_halo_traffic_scales_with_cut_not_graph():
    """The blueprint's bandwidth claim (SURVEY §2.3, halo.py docstring):
    ICI bytes per exchange scale with the CUT SIZE, not the graph size.
    Contiguous node shards cut at most (n_shards - 1) molecule boundaries,
    so doubling the number of molecules leaves the per-pair halo bounded
    while the node-replicated alternative's traffic grows linearly."""
    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.parallel.halo import halo_stats, partition_halo

    ds = make_synthetic_dataset(seed=29, num_graphs=64)

    def stats_for(n_graphs):
        spec = spec_for_graphs(ds.graphs[:n_graphs], batch_size=n_graphs)
        batch = next(iter(GraphLoader(ds.graphs[:n_graphs], spec, n_graphs)))
        return halo_stats(partition_halo(batch, 4))

    small, big = stats_for(16), stats_for(64)
    # Replicated-design traffic grows with the graph (~4x here)...
    growth_rep = (
        big["replicated_alternative_rows"] / small["replicated_alternative_rows"]
    )
    assert growth_rep > 3.0, (small, big)
    # ...while halo traffic is pinned by the O(n_shards) cut: it must grow
    # strictly slower, and stay a small fraction of replication.
    growth_halo = (
        big["halo_rows_per_exchange"] / small["halo_rows_per_exchange"]
    )
    assert growth_halo < growth_rep / 1.5, (small, big)
    assert (
        big["halo_rows_per_exchange"]
        < 0.25 * big["replicated_alternative_rows"]
    ), big


def test_hybrid_train_step_matches_single_device():
    """Hybrid 2D mesh (2 data groups x 2 halo model shards, 4 devices):
    one full train step on two 8-graph groups == the single-device Trainer
    step on the undivided 16-graph batch — global psum'd BN statistics,
    the masked-mean loss over all 16 graphs, grads reduced by
    psum(pmean(., model), data), AdamW update. Chain molecules (no
    permutation-score ties); run TWO consecutive steps on fresh global
    batches sharing pinned capacities (one compiled program)."""
    from molkgnn_tpu.graphs.batch import batch_graphs
    from molkgnn_tpu.data.dataset import Dataset
    from molkgnn_tpu.parallel.halo import partition_halo
    from molkgnn_tpu.parallel.hybrid import (
        hybrid_train_step,
        make_mesh_2d,
        partition_hybrid,
    )

    graphs = _chain_graphs(seed=53, n_graphs=32)
    spec = spec_for_graphs(graphs, batch_size=16)
    spec8 = spec_for_graphs(graphs, batch_size=8)
    ds = Dataset(
        name="chains",
        graphs=graphs,
        split={
            "train": np.arange(24),
            "valid": np.arange(24, 28),
            "test": np.arange(28, 32),
        },
        metrics=["AUC"],
        loss_name="bce_with_logits",
    )
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=2,
            kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=16, max_epochs=1, warmup_iterations=5,
        oversample=False, progress=False, use_device_data=False,
    )
    trainer = Trainer(model, ds, spec, cfg)

    group_lists = [
        [graphs[:8], graphs[8:16]],
        [graphs[16:24], graphs[24:32]],
    ]
    # One pinned capacity set across both steps: a single compiled program.
    caps = None
    for gl in group_lists:
        for g in gl:
            c = partition_halo(batch_graphs(g, spec8), 2).caps()
            caps = c if caps is None else {
                k: (
                    tuple(max(a, b) for a, b in zip(caps[k], c[k]))
                    if k == "buckets"
                    else max(caps[k], c[k])
                )
                for k in caps
            }

    mesh = make_mesh_2d(2, 2)
    step = hybrid_train_step(model, trainer.tx, mesh)
    state_sd = jax.tree.map(jnp.array, trainer.state)
    state_hy = jax.tree.map(jnp.array, trainer.state)
    shapes = None
    for gl in group_lists:
        sd_batch = batch_graphs(gl[0] + gl[1], spec)
        hb = partition_hybrid(
            [batch_graphs(g, spec8) for g in gl], 2, caps=caps
        )
        s = jax.tree.map(lambda a: np.asarray(a).shape, hb)
        assert shapes is None or s == shapes  # pinned: no recompilation
        shapes = s
        state_sd, sd_loss = trainer._train_step(state_sd, sd_batch)
        state_hy, hy_loss = step(state_hy, hb)
        np.testing.assert_allclose(
            float(hy_loss), float(sd_loss), rtol=1e-6
        )
    _assert_states_close(state_hy, state_sd)


def test_hybrid_parallel_forward_matches_single_device():
    """Eval-mode hybrid 2D forward: each data group's pooled embeddings
    equal the single-device encoder forward on that group's batch."""
    from molkgnn_tpu.graphs.batch import batch_graphs
    from molkgnn_tpu.parallel.hybrid import (
        hybrid_parallel_forward,
        make_mesh_2d,
        partition_hybrid,
    )

    graphs = _chain_graphs(seed=61, n_graphs=16)
    spec8 = spec_for_graphs(graphs, batch_size=8)
    model = MolKGNNNet(
        num_layers=2,
        kernels_1hop=(2, 3, 4, 5),
        kernels_nhop=(2, 3, 4, 5),
        graph_embedding_dim=8,
    )
    b0 = batch_graphs(graphs[:8], spec8)
    b1 = batch_graphs(graphs[8:], spec8)
    variables = model.init(jax.random.key(0), b0)

    hyb = partition_hybrid([b0, b1], 2)
    mesh = make_mesh_2d(2, 2)
    got = np.asarray(hybrid_parallel_forward(model, mesh)(variables, hyb))
    assert got.shape[0] == 2
    for i, b in enumerate([b0, b1]):
        want = np.asarray(model.apply(variables, b))
        np.testing.assert_allclose(got[i], want, rtol=2e-5, atol=2e-5)


def test_trainer_model_parallel_halo_fit_matches_single_device():
    """TrainConfig.model_parallel='halo': the Trainer's own fit/evaluate
    run through the halo partition end-to-end (pinned caps, one program)
    and track the single-device Trainer epoch-for-epoch on the same
    sampled batches — train losses, eval metrics, and final params."""
    from molkgnn_tpu.data.dataset import Dataset

    graphs = _chain_graphs(seed=71, n_graphs=32)
    spec = spec_for_graphs(graphs, batch_size=8)
    ds = Dataset(
        name="chains",
        graphs=graphs,
        split={
            "train": np.arange(24),
            "valid": np.arange(24, 28),
            "test": np.arange(28, 32),
        },
        metrics=["AUC"],
        loss_name="bce_with_logits",
    )

    def make(mesh, mp):
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=2,
                kernels_1hop=(2, 3, 4, 5),
                kernels_nhop=(2, 3, 4, 5),
                graph_embedding_dim=8,
            ),
            ffn_dropout_rate=0.0,
        )
        cfg = TrainConfig(
            batch_size=8, max_epochs=2, warmup_iterations=5,
            oversample=False, progress=False, use_device_data=False,
            model_parallel=mp,
        )
        return Trainer(model, ds, spec, cfg, mesh=mesh)

    sd = make(None, None)
    h_sd = sd.fit()

    halo = make(make_mesh(4), "halo")
    assert halo._halo_step is not None
    h_halo = halo.fit()

    assert len(h_halo) == len(h_sd) == 2
    for a, b in zip(h_halo, h_sd):
        np.testing.assert_allclose(
            a["train_loss"], b["train_loss"], rtol=1e-5
        )
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-4)
        np.testing.assert_allclose(a["AUC"], b["AUC"], rtol=1e-6)
    for g, w in zip(
        jax.tree.leaves(halo.state.params), jax.tree.leaves(sd.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=1e-5
        )
    # test() runs the halo eval path per checkpoint tag
    res = halo.test()
    assert "last" in res and np.isfinite(res["last"]["AUC"])


def test_trainer_halo_caps_regrow_on_overflow():
    """An eval/train batch that overflows the run-pinned halo capacities
    must re-widen them (one recompile) instead of killing the run."""
    from molkgnn_tpu.data.dataset import Dataset

    graphs = _chain_graphs(seed=77, n_graphs=16, lo=10, hi=16)
    spec = spec_for_graphs(graphs, batch_size=8)
    ds = Dataset(
        name="chains", graphs=graphs,
        split={"train": np.arange(12), "valid": np.arange(12, 14),
               "test": np.arange(14, 16)},
        metrics=["AUC"], loss_name="bce_with_logits",
    )
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1, kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5), graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_epochs=1, warmup_iterations=3, oversample=False,
        progress=False, use_device_data=False, model_parallel="halo",
    )
    trainer = Trainer(model, ds, spec, cfg, mesh=make_mesh(4))
    batch = next(iter(GraphLoader(ds.graphs[:8], spec, 8)))
    trainer._partition_halo_pinned(batch)  # pins caps
    # Sabotage the pinned caps so the same batch now overflows.
    trainer._halo_caps = dict(trainer._halo_caps, el=8)
    hb = trainer._partition_halo_pinned(batch)  # must regrow, not raise
    assert trainer._halo_caps["el"] >= 8
    assert int(np.asarray(hb.edge_mask_local).sum()) > 0


def test_trainer_model_parallel_hybrid_fit_matches_single_device():
    """TrainConfig.model_parallel='hybrid' on a 2x2 mesh: each optimizer
    step consumes 2 loader batches of 8 (global batch 16). The
    single-device Trainer with batch_size=16 consumes the IDENTICAL id
    stream (same seeded shuffle order), so with tot_iterations pinned the
    two runs must track each other epoch-for-epoch."""
    from molkgnn_tpu.data.dataset import Dataset
    from molkgnn_tpu.parallel.hybrid import make_mesh_2d

    graphs = _chain_graphs(seed=83, n_graphs=40)
    spec = spec_for_graphs(graphs, batch_size=16)
    ds = Dataset(
        name="chains", graphs=graphs,
        split={"train": np.arange(32), "valid": np.arange(32, 36),
               "test": np.arange(36, 40)},
        metrics=["AUC"], loss_name="bce_with_logits",
    )

    def make(mesh, mp, bs):
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=2, kernels_1hop=(2, 3, 4, 5),
                kernels_nhop=(2, 3, 4, 5), graph_embedding_dim=8,
            ),
            ffn_dropout_rate=0.0,
        )
        cfg = TrainConfig(
            batch_size=bs, max_epochs=2, warmup_iterations=5,
            tot_iterations=10, oversample=False, progress=False,
            use_device_data=False, model_parallel=mp,
        )
        return Trainer(model, ds, spec, cfg, mesh=mesh)

    sd = make(None, None, 16)
    h_sd = sd.fit()

    hy = make(make_mesh_2d(2, 2), "hybrid", 8)
    assert hy._hybrid_step is not None
    h_hy = hy.fit()

    assert len(h_hy) == len(h_sd) == 2
    for a, b in zip(h_hy, h_sd):
        np.testing.assert_allclose(
            a["train_loss"], b["train_loss"], rtol=1e-5
        )
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-4)
    for g, w in zip(
        jax.tree.leaves(hy.state.params), jax.tree.leaves(sd.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=1e-5
        )
    res = hy.test()
    assert "last" in res and np.isfinite(res["last"]["AUC"])


def test_halo_sample_steps_match_single_device_devsample():
    """VERDICT r3 item 2: the device-resident halo path (on-device
    sampling + per-shard on-device assembly + molecule-aligned empty-cut
    partition, halo.halo_sample_steps) must take the SAME optimizer
    trajectory as the single-device device-sampling path: the per-step key
    stream is identical, so both draw the same global ids, and the halo
    step body (global psum'd BN, pmean'd grads) reproduces the
    single-device update to fp tolerance. Chain molecules — no
    permutation-score ties."""
    from molkgnn_tpu.data.dataset import Dataset

    graphs = _chain_graphs(seed=61, n_graphs=32)
    ds = Dataset(
        name="chains",
        graphs=graphs,
        split={
            "train": np.arange(24),
            "valid": np.arange(24, 28),
            "test": np.arange(28, 32),
        },
        metrics=["AUC"],
        loss_name="bce_with_logits",
    )
    spec = spec_for_graphs(graphs, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=2,
            kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )

    def cfg(**kw):
        return TrainConfig(
            batch_size=8, max_epochs=1, warmup_iterations=5,
            oversample=True, device_sampling=True, progress=False,
            tot_iterations=50, **kw,
        )

    t_sd = Trainer(model, ds, spec, cfg())
    t_h = Trainer(
        model, ds, spec, cfg(model_parallel="halo"), mesh=make_mesh(4)
    )
    assert t_h._shard_spec.num_graphs == 2

    k = 3
    sd_state, sd_loss, sd_edges = t_sd._train_steps_sample(k)(
        jax.tree.map(jnp.array, t_sd.state),
        t_sd._device_data,
        *t_sd._sample_consts,
    )
    h_state, h_loss, h_edges = t_h._train_steps_sample(k)(
        jax.tree.map(jnp.array, t_h.state),
        t_h._device_data,
        *t_h._sample_consts,
    )
    # Same ids drawn => same true-edge accounting per step.
    np.testing.assert_array_equal(np.asarray(h_edges), np.asarray(sd_edges))
    np.testing.assert_allclose(
        np.asarray(h_loss), np.asarray(sd_loss), rtol=1e-5
    )
    _assert_states_close(h_state, sd_state)

    # scan_chunk parity on the halo path: k=4 nested as 2x2 must equal
    # the flat halo scan step-for-step (the same TrainConfig.scan_chunk
    # contract the single-device and DP twins enforce).
    from molkgnn_tpu.parallel.halo import halo_sample_steps

    k4 = 4
    flat_prog = t_h._train_steps_sample(k4)
    nest_prog = halo_sample_steps(
        t_h.model, t_h.tx, t_h.mesh, t_h._shard_spec, 8, k4,
        t_h._SAMPLE_SALT, loss_fn=t_h.loss_fn, chunk=2,
    )
    f_state, f_loss, f_edges = flat_prog(
        jax.tree.map(jnp.array, t_h.state),
        t_h._device_data, *t_h._sample_consts,
    )
    n_state, n_loss, n_edges = nest_prog(
        jax.tree.map(jnp.array, t_h.state),
        t_h._device_data, *t_h._sample_consts,
    )
    np.testing.assert_array_equal(np.asarray(n_edges), np.asarray(f_edges))
    np.testing.assert_allclose(
        np.asarray(n_loss), np.asarray(f_loss), rtol=1e-6
    )
    _assert_states_close(n_state, f_state)


def test_hybrid_sample_steps_match_manual_global_batch():
    """hybrid_sample_steps (2 data groups x 2 model shards): one
    device-resident optimizer step == the single-device step on the
    undivided 2*B global batch built from the ids each group provably
    draws (the fold chain rng -> step -> salt -> data index is re-derived
    on host). Exercises both-axes BN psums, the global masked-mean loss,
    and psum(pmean(grads, model), data)."""
    from molkgnn_tpu.data.dataset import Dataset
    from molkgnn_tpu.graphs.batch import batch_graphs
    from molkgnn_tpu.graphs.device_pack import sample_ids
    from molkgnn_tpu.parallel.hybrid import make_mesh_2d

    graphs = _chain_graphs(seed=67, n_graphs=32)
    ds = Dataset(
        name="chains",
        graphs=graphs,
        split={
            "train": np.arange(24),
            "valid": np.arange(24, 28),
            "test": np.arange(28, 32),
        },
        metrics=["AUC"],
        loss_name="bce_with_logits",
    )
    spec8 = spec_for_graphs(graphs, batch_size=8)
    spec16 = spec_for_graphs(graphs, batch_size=16)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=2,
            kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg_hy = TrainConfig(
        batch_size=8, max_epochs=1, warmup_iterations=5, oversample=True,
        device_sampling=True, progress=False, tot_iterations=50,
        model_parallel="hybrid",
    )
    cfg_sd = TrainConfig(
        batch_size=16, max_epochs=1, warmup_iterations=5, oversample=True,
        progress=False, tot_iterations=50,
    )
    t_hy = Trainer(model, ds, spec8, cfg_hy, mesh=make_mesh_2d(2, 2))
    t_sd = Trainer(model, ds, spec16, cfg_sd)

    # Re-derive each group's ids on host (same key chain as the program).
    tids, table = t_hy._sample_consts
    base = jax.random.fold_in(
        jax.random.fold_in(t_hy.state.rng, t_hy.state.step),
        Trainer._SAMPLE_SALT,
    )
    ids = np.concatenate(
        [
            np.asarray(
                sample_ids(jax.random.fold_in(base, d), table, tids, 8)
            )
            for d in range(2)
        ]
    )
    sd_batch = batch_graphs([graphs[i] for i in ids], spec16)

    hy_state, hy_loss, hy_edges = t_hy._train_steps_sample(1)(
        jax.tree.map(jnp.array, t_hy.state),
        t_hy._device_data,
        tids,
        table,
    )
    sd_state, sd_loss = t_sd._train_step(
        jax.tree.map(jnp.array, t_sd.state), sd_batch
    )
    assert int(np.asarray(hy_edges)[0]) == sum(
        graphs[i].num_edges for i in ids
    )
    np.testing.assert_allclose(
        float(np.asarray(hy_loss)[0]), float(sd_loss), rtol=1e-5
    )
    _assert_states_close(hy_state, sd_state)


def test_halo_devsample_fit_epoch_budget_and_eval(tmp_path):
    """Full fit() through the device-resident halo path: zero per-step
    host input, host sampler's optimizer-step budget per epoch, finite
    losses, and the (host-partitioned, per-epoch) halo evaluation path
    still drives metrics."""
    ds = make_synthetic_dataset(seed=71, num_graphs=48, active_fraction=0.3)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=2,
            kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_epochs=2, warmup_iterations=5, oversample=True,
        device_sampling=True, scan_steps=3, progress=False,
        model_parallel="halo", log_dir=str(tmp_path / "logs"),
    )
    trainer = Trainer(model, ds, spec, cfg, mesh=make_mesh(4))
    history = trainer.fit()
    assert len(history) == 2
    n_train = len(ds.split["train"])
    steps_per_epoch = -(-n_train // 8)
    assert int(np.asarray(trainer.state.step)) == 2 * steps_per_epoch
    assert np.isfinite(history[-1]["train_loss"])
    assert np.isfinite(history[-1]["loss"])


def test_schnet_device_resident_dp_devsample(tmp_path):
    """The 3D-family device-resident pipeline composes with data
    parallelism: a SchNet fit over a 2-device mesh with device_sampling
    draws every chip's ids on device (zero per-step host input), keeps
    the DP step budget, and produces finite losses."""
    from molkgnn_tpu.data.dataset import Dataset, QSAR_METRICS
    from molkgnn_tpu.data.synthetic import random_molgraph
    from molkgnn_tpu.graphs.device_points import DevicePointDataset
    from molkgnn_tpu.models.registry import get_family

    rng = np.random.default_rng(5)
    graphs = [random_molgraph(rng, num_atoms=12) for _ in range(64)]
    for i, g in enumerate(graphs):
        g.y = float(i % 3 == 0)
    ds = Dataset(
        name="schnet-dp",
        graphs=graphs,
        split={
            "train": np.arange(48),
            "valid": np.arange(48, 56),
            "test": np.arange(56, 64),
        },
        metrics=list(QSAR_METRICS),
        loss_name="bce_with_logits",
    )
    fam = get_family("schnet")
    spec = fam.make_spec(graphs, batch_size=8, cutoff=3.0)
    model = GNNModel(
        encoder=fam.make_encoder(
            cutoff=3.0, num_layers=1, hidden_channels=16,
            num_filters=16, out_channels=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_epochs=2, warmup_iterations=5, oversample=True,
        device_sampling=True, scan_steps=2, progress=False,
        log_dir=str(tmp_path / "logs"),
    )
    trainer = Trainer(model, ds, spec, cfg, mesh=make_mesh(2), collate=fam.collate)
    assert isinstance(
        jax.tree.leaves(trainer._device_data)[0].sharding,
        jax.sharding.NamedSharding,
    )
    history = trainer.fit()
    assert len(history) == 2
    assert all(np.isfinite(h["train_loss"]) for h in history)
    # DP step budget: ceil(48/8)=6 steps/epoch over 2 devices -> 3.
    assert int(np.asarray(trainer.state.step)) == 2 * 3
