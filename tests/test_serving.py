"""Serving path + determinism tests."""

import os

import numpy as np

from molkgnn_tpu.data.dataset import make_synthetic_dataset
from molkgnn_tpu.graphs import spec_for_graphs
from molkgnn_tpu.models import MolKGNNNet
from molkgnn_tpu.serving import Predictor
from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer


def _trained(tmp_path, seed=0):
    ds = make_synthetic_dataset(seed=seed, num_graphs=48, active_fraction=0.3)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1, kernels_1hop=(2, 2, 2, 2), kernels_nhop=(2, 2, 2, 2),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_epochs=2, warmup_iterations=3, oversample=True,
        progress=False, log_dir=str(tmp_path / "logs"),
    )
    trainer = Trainer(model, ds, spec, cfg)
    trainer.fit()
    return ds, trainer


def test_predictor_from_trainer(tmp_path):
    ds, trainer = _trained(tmp_path)
    pred = Predictor.from_trainer(trainer, tag="last")
    graphs = ds.subset("test")
    scores = pred.predict_graphs(graphs)
    assert scores.shape == (len(graphs),)
    probs = pred.predict_graphs(graphs, probabilities=True)
    assert np.all((probs >= 0) & (probs <= 1))
    # Chunking: many molecules through a small spec.
    many = ds.graphs * 2  # 96 molecules, batch capacity 8
    s_many = pred.predict_graphs(many)
    assert s_many.shape == (96,)
    np.testing.assert_allclose(s_many[: len(ds.graphs)], s_many[len(ds.graphs):],
                               rtol=1e-5, atol=1e-6)
    # Embeddings surface
    s, emb = pred.predict_graphs(graphs[:3], return_embeddings=True)
    assert emb.shape == (3, 8)


def test_predictor_smiles_with_invalid(tmp_path):
    _, trainer = _trained(tmp_path)
    pred = Predictor.from_trainer(trainer)
    out = pred.predict_smiles(["CCO", "not_a_smiles((", "c1ccccc1"])
    assert np.isfinite(out[0]) and np.isfinite(out[2])
    assert np.isnan(out[1])


def test_training_is_deterministic(tmp_path):
    """Same seed + same data => identical history metrics (golden check)."""
    _, t1 = _trained(tmp_path / "a", seed=3)
    _, t2 = _trained(tmp_path / "b", seed=3)
    for h1, h2 in zip(t1.history, t2.history):
        for k in ("train_loss", "loss", "AUC"):
            np.testing.assert_allclose(h1[k], h2[k], rtol=1e-6)


def test_export_roundtrip(tmp_path):
    """AOT export -> load without model code -> identical predictions."""
    ds, trainer = _trained(tmp_path, seed=5)
    pred = Predictor.from_trainer(trainer)
    graphs = ds.subset("test")[:4]
    want = pred.predict_graphs(graphs)

    path = str(tmp_path / "model.export")
    pred.export(path)
    call, spec = Predictor.load_exported(path)
    from molkgnn_tpu.graphs.batch import batch_graphs

    batch = batch_graphs(graphs, spec)
    import jax

    out, emb = call(jax.tree.map(lambda a: np.asarray(a), batch))
    got = np.asarray(out)[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_screen_library_matches_predict_graphs():
    """Device-resident library screening (Predictor.screen_library) must
    produce EXACTLY predict_graphs' scores (same compiled math via the
    bit-identical on-device assembly), for whole and ragged libraries and
    across slab boundaries."""
    import jax

    from molkgnn_tpu.graphs import batch_graphs

    ds = make_synthetic_dataset(seed=21, num_graphs=50)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1, kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5), graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    batch = batch_graphs(ds.graphs[:8], spec)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.key(0), batch
    )
    pred = Predictor(
        model, variables["params"], variables.get("batch_stats", {}), spec
    )
    want = pred.predict_graphs(ds.graphs)
    got = pred.screen_library(ds.graphs)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # Ragged tail + tiny slabs exercising the slab loop and program cache.
    got2 = pred.screen_library(ds.graphs[:19], slab=7)
    want2 = pred.predict_graphs(ds.graphs[:19])
    assert got2.shape == (19,)
    np.testing.assert_allclose(got2, want2, rtol=2e-5, atol=1e-6)
    assert pred._screen_prog is not None  # one jitted program, shape-cached
    probs = pred.screen_library(ds.graphs[:5], probabilities=True)
    assert np.all((probs >= 0) & (probs <= 1))


def test_screen_library_mesh_matches_single_device():
    """Data-parallel serving (screen_library mesh=...): the id-block
    matrix shards over the mesh and each chip scores its own blocks —
    scores must equal the single-device path's exactly, including a
    ragged block count that needs masked all-pad blocks to reach a
    device multiple."""
    import jax

    from molkgnn_tpu.graphs import batch_graphs
    from molkgnn_tpu.parallel import make_mesh

    ds = make_synthetic_dataset(seed=23, num_graphs=50)
    spec = spec_for_graphs(ds.graphs, batch_size=4)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1, kernels_1hop=(2, 3, 4, 5),
            kernels_nhop=(2, 3, 4, 5), graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    batch = batch_graphs(ds.graphs[:4], spec)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.key(0), batch
    )
    pred = Predictor(
        model, variables["params"], variables.get("batch_stats", {}), spec
    )
    mesh = make_mesh(4)
    want = pred.screen_library(ds.graphs)
    # 50 graphs / b4 -> 13 blocks: not a multiple of 4 devices, so the
    # mesh path pads with a masked all-(-1) block.
    got = pred.screen_library(ds.graphs, mesh=mesh)
    assert got.shape == want.shape == (50,)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    assert pred._screen_prog_dp is not None
    # Regression (r5): the DP program's [K, ndev, B] feed contract must
    # hold at ANY device count — a 1-device mesh used to crash because
    # the feed reshape was gated on ndev > 1.
    got1 = pred.screen_library(ds.graphs, mesh=make_mesh(1))
    np.testing.assert_allclose(got1, want, rtol=2e-5, atol=1e-6)


def test_screen_library_raises_on_overflowing_batch():
    """The device gather cannot detect overflow, so screen_library must
    host-check every batch against the spec and raise (like the host
    packer) instead of silently truncating scores for libraries with
    molecules larger than the spec's source set."""
    import jax

    from molkgnn_tpu.graphs import batch_graphs

    ds = make_synthetic_dataset(seed=22, num_graphs=40)
    # Spec built over the SMALLEST molecules only -> larger library
    # members overflow it.
    small = sorted(ds.graphs, key=lambda g: g.num_nodes)[:16]
    spec = spec_for_graphs(small, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1, kernels_1hop=(2, 2, 2, 2),
            kernels_nhop=(2, 2, 2, 2), graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    batch = batch_graphs(small[:8], spec)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.key(0), batch
    )
    pred = Predictor(
        model, variables["params"], variables.get("batch_stats", {}), spec
    )
    big_first = sorted(ds.graphs, key=lambda g: -g.num_nodes)
    import pytest

    with pytest.raises(ValueError, match="exceeds the spec"):
        pred.screen_library(big_first)


def test_molkgnn_screen_cli_scores_sdf(tmp_path):
    """The deployment loop closes without model code: train -> export ->
    `molkgnn-screen` scores an SDF library (with an unparseable record
    scoring NaN at its preserved position) into a CSV."""
    import subprocess
    import sys

    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.sdf import write_sdf
    from molkgnn_tpu.chem.smiles import parse_smiles

    ds, trainer = _trained(tmp_path)
    pred = Predictor.from_trainer(trainer)
    art = tmp_path / "model.mkx"
    pred.export(str(art))

    def mk(smi, i):
        m = parse_smiles(smi, add_hs=True)
        pos = embed_molecule(m, seed=i, iterations=40)
        for k, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[k])
        return m

    sdf = tmp_path / "lib.sdf"
    write_sdf(str(sdf), [mk(s, i) for i, s in enumerate(["CCO", "CCN", "CCC"])])
    # Append a corrupt record: parse failure must yield a NaN row.
    with open(sdf, "a") as f:
        f.write("garbage\n\n\n  0  0\nM  END\n$$$$\n")

    out = tmp_path / "scores.csv"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.screen",
         "--exported", str(art), "--sdf", str(sdf), "--out", str(out),
         "--probabilities"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "record_index,score"
    assert len(lines) == 5  # 4 records
    vals = [ln.split(",")[1] for ln in lines[1:]]
    assert vals[3] == ""  # corrupt record -> NaN (empty cell)
    nums = [float(v) for v in vals[:3]]
    assert all(0.0 <= v <= 1.0 for v in nums), nums


def test_export_and_screen_cli_non_kgnn_families(tmp_path):
    """r5 regression: serving must work for the non-kgnn batch families
    (the importer CLI advertises all five). Three things used to break:
    export's template batch read kgnn-only spec fields (PointBatchSpec has
    no node_dim — now the point/chiro template collates an empty molecule
    list), the Predictor's default collate was kgnn's, and
    `molkgnn-screen` hardcoded the kgnn featurize+pack (now dispatched on
    the spec type carried in the artifact)."""
    import subprocess
    import sys

    import jax

    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.features import mol_to_graph
    from molkgnn_tpu.chem.sdf import write_sdf
    from molkgnn_tpu.chem.smiles import parse_smiles
    from molkgnn_tpu.graphs.chiro import (
        chiro_spec_for_graphs,
        mol_to_chiro_graph,
    )
    from molkgnn_tpu.graphs.geometric import point_spec_for_graphs
    from molkgnn_tpu.models.chironet import ChIRoNet
    from molkgnn_tpu.models.schnet import SchNet

    def mk(smi, i):
        m = parse_smiles(smi, add_hs=True)
        pos = embed_molecule(m, seed=i, iterations=40)
        for k, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[k])
        return m

    mols = [mk(s, i) for i, s in enumerate(["CCO", "CCN", "CCCC"])]
    sdf = tmp_path / "lib.sdf"
    write_sdf(str(sdf), mols)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"

    cases = []
    pgraphs = [mol_to_graph(m, y=0.0, idx=i) for i, m in enumerate(mols)]
    cases.append((
        "schnet",
        SchNet(num_layers=1, hidden_channels=8, num_filters=8,
               num_gaussians=8, out_channels=8),
        pgraphs,
        point_spec_for_graphs(pgraphs, batch_size=4, cutoff=10.0),
    ))
    cgraphs = [mol_to_chiro_graph(m, y=0.0, idx=i) for i, m in enumerate(mols)]
    assert all(g is not None for g in cgraphs)
    cases.append((
        "chironet",
        ChIRoNet(f_h=8, f_h_econv=8, econv_mlp_hidden=(8,),
                 gat_hidden=(8,), gat_heads=1, hidden_d=(8,),
                 hidden_phi=(8,), hidden_c=(8,), hidden_shift=(8,),
                 hidden_alpha=(8,), f_z=(4, 4, 4)),
        cgraphs,
        chiro_spec_for_graphs(cgraphs, batch_size=4),
    ))

    from molkgnn_tpu.serving.predictor import host_pipeline_for_spec

    for name, encoder, graphs, spec in cases:
        model = GNNModel(encoder=encoder, ffn_dropout_rate=0.0)
        collate = host_pipeline_for_spec(spec)[1]
        batch0 = collate(graphs, spec)
        variables = jax.jit(lambda r, b, m=model: m.init(r, b, train=False))(
            jax.random.key(0), batch0
        )
        # Default collate dispatches on the spec type (no collate= arg).
        pred = Predictor(
            model, variables["params"], variables.get("batch_stats", {}), spec
        )
        want = pred.predict_graphs(graphs)
        art = tmp_path / f"{name}.mkx"
        pred.export(str(art))
        out = tmp_path / f"{name}_scores.csv"
        r = subprocess.run(
            [sys.executable, "-m", "molkgnn_tpu.cli.screen",
             "--exported", str(art), "--sdf", str(sdf), "--out", str(out)],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert r.returncode == 0, (name, r.stderr[-2000:])
        lines = out.read_text().strip().splitlines()
        assert lines[0] == "record_index,score"
        got = np.array([float(ln.split(",")[1]) for ln in lines[1:]])
        assert got.shape == (3,), name
        # Exported StableHLO vs in-process jit: two fp32 compilations of
        # the same math, so fp-association differences up to ~1e-4 rel.
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5,
                                   err_msg=name)
