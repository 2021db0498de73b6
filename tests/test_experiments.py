"""Experiment layer tests: CLI, sweep, aggregation, monitors, analyses,
D4DCHP datasets."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from molkgnn_tpu.experiments.aggregate import aggregate_results, parse_test_result
from molkgnn_tpu.experiments.sweep import (
    SweepConfig,
    experiment_name,
    grid_points,
    run_sweep,
)

CLI_ENV = None


def _cli_env():
    global CLI_ENV
    if CLI_ENV is None:
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        CLI_ENV = env
    return CLI_ENV


TINY_KGNN = [
    "--gnn_type", "kgnn", "--num_layers", "2",
    "--num_kernel1_1hop", "2", "--num_kernel2_1hop", "3",
    "--num_kernel3_1hop", "4", "--num_kernel4_1hop", "5",
    "--num_kernel1_Nhop", "2", "--num_kernel2_Nhop", "3",
    "--num_kernel3_Nhop", "4", "--num_kernel4_Nhop", "5",
    "--hidden_dim", "8", "--batch_size", "16", "--max_epochs", "1",
    "--warmup_iterations", "3",
]


def test_cli_trains_on_synthetic(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.entry",
         "--dataset_name", "synthetic", *TINY_KGNN,
         "--default_root_dir", str(tmp_path), "--task_name", "t"],
        capture_output=True, text=True, timeout=500, env=_cli_env(),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    logs = tmp_path / "logs"
    assert (logs / "test_result.log").exists()
    assert (logs / "task_info.log").exists()
    assert (logs / "kernels" / "kernels.npz").exists()
    assert (logs / "graph_embedding.npy").exists()
    parsed = parse_test_result(str(logs / "test_result.log"))
    assert "last" in parsed and "AUC" in parsed["last"]


def test_cli_balanced_batches_flag(tmp_path):
    """--balanced_batches: size-dealt batches on the tight sampler-aware
    spec (graphs/balance.py) through the full CLI chain."""
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.entry",
         "--dataset_name", "synthetic", *TINY_KGNN,
         "--balanced_batches",
         "--default_root_dir", str(tmp_path), "--task_name", "t"],
        capture_output=True, text=True, timeout=500, env=_cli_env(),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    parsed = parse_test_result(str(tmp_path / "logs" / "test_result.log"))
    assert "last" in parsed and "AUC" in parsed["last"]


def test_cli_full_qsar_chain_aid9999(tmp_path):
    """Real-AID readiness (VERDICT r1 item 9): the moment real PubChem SDF
    data lands, ``molkgnn --dataset_name {AID}`` must work unchanged. This
    drives that exact command against a synthetic SDF pair written in the
    reference's file layout (``{AID}_actives_new.sdf`` under
    qsar/clean_sdf/raw, wrapper.py:410-413) with the REAL AID-9999 record
    counts (37 actives / 226 inactives, utils/data_split.py:78) so the
    regenerated shrink split's indices correspond 1:1, proving
    ingest -> split -> train -> test_result.log end to end."""
    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.sdf import write_sdf
    from molkgnn_tpu.chem.smiles import parse_smiles

    pool = [
        "CCO", "CC(=O)O", "c1ccccc1", "CCN", "CCC", "CCCC", "CC(C)C",
        "CCOC", "CCS", "CNC", "COC", "CCCl", "CCBr", "CCF", "c1ccncc1",
        "CC(N)=O", "CC(C)O", "CCCO", "CCCC(=O)O", "Oc1ccccc1",
    ]

    def mols(n, seed0):
        out = []
        for i in range(n):
            m = parse_smiles(pool[i % len(pool)], add_hs=True)
            pos = embed_molecule(m, seed=seed0 + i, iterations=40)
            for k, a in enumerate(m.atoms):
                a.x, a.y, a.z = map(float, pos[k])
            out.append(m)
        return out

    raw = tmp_path / "dataset" / "qsar" / "clean_sdf" / "raw"
    raw.mkdir(parents=True)
    write_sdf(str(raw / "9999_actives_new.sdf"), mols(37, seed0=0))
    write_sdf(str(raw / "9999_inactives_new.sdf"), mols(226, seed0=1000))

    root = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.entry",
         "--dataset_name", "9999",
         "--dataset_path", str(tmp_path / "dataset"), *TINY_KGNN,
         "--default_root_dir", str(root), "--task_name", "aid9999"],
        capture_output=True, text=True, timeout=560, env=_cli_env(),
    )
    assert r.returncode == 0, (r.stderr[-3000:], r.stdout[-1000:])
    logs = root / "logs"
    parsed = parse_test_result(str(logs / "test_result.log"))
    assert "last" in parsed and "AUC" in parsed["last"]
    assert "logAUC_0.001_0.1" in parsed["last"]
    assert (logs / "task_info.log").exists()
    # the ingest cache in the reference's processed/ location
    cache = tmp_path / "dataset" / "qsar" / "clean_sdf" / "processed"
    assert any(cache.glob("kgnn-9999-*.npz")), list(cache.glob("*"))


def test_grid_points_and_names():
    grid = {"peak_lr": [1e-2, 1e-3], "num_layers": [2, 3]}
    pts = grid_points(grid)
    assert len(pts) == 4
    names = {experiment_name(p) for p in pts}
    assert len(names) == 4
    assert "num_layers-2_peak_lr-0.01" in names


def test_sweep_dry_run_and_resume(tmp_path):
    cfg = SweepConfig(
        base_args={"dataset_name": "synthetic"},
        grid={"peak_lr": [1e-2, 1e-3]},
        out_dir=str(tmp_path),
    )
    records = run_sweep(cfg, dry_run=True)
    assert all(r["status"] == "planned" for r in records)
    # Simulate a finished experiment -> resume skips it.
    done = tmp_path / records[0]["name"] / "logs"
    done.mkdir(parents=True)
    (done / "test_result.log").write_text("[last]\nAUC: 0.5\n")
    records = run_sweep(cfg, dry_run=True)
    assert records[0]["status"] == "done"
    assert records[1]["status"] == "planned"


def test_aggregate_results(tmp_path):
    for name, auc in (("exp_a", 0.7), ("exp_b", 0.9)):
        d = tmp_path / name / "logs"
        d.mkdir(parents=True)
        (d / "test_result.log").write_text(
            f"[last]\nAUC: {auc}\nloss: 0.5\n[best_AUC]\nAUC: {auc + 0.01}\n"
        )
    tables = aggregate_results(str(tmp_path), out_dir=str(tmp_path / "agg"))
    assert "AUC" in tables
    rows = tables["AUC"]
    assert rows[0] == ["experiment", "best_AUC", "last"]
    assert rows[1][0] == "exp_a" and float(rows[1][2]) == 0.7
    assert (tmp_path / "agg" / "all_test_result_df_AUC.csv").exists()


def test_monitors():
    from molkgnn_tpu.training.monitors import MetricMonitor, jsonl_sink

    records = []
    mon = MetricMonitor(sinks=[records.append])
    mon.on_epoch_end(0, {"loss": 1.0})
    mon.on_epoch_end(1, {"loss": 0.5, "AUC": 0.8})
    assert len(mon.history) == 2
    assert records[1]["AUC"] == 0.8


def test_kernel_reader(tmp_path):
    rng = np.random.default_rng(0)
    payload = {}
    for deg, L in ((1, 2), (2, 2), (3, 2), (4, 2)):
        payload[f"kernelconv{deg}/x_center"] = rng.standard_normal((L, 28))
        payload[f"kernelconv{deg}/x_support"] = rng.standard_normal((L, deg, 28))
        payload[f"kernelconv{deg}/edge_attr_support"] = rng.standard_normal(
            (L, deg, 7)
        )
        payload[f"kernelconv{deg}/p_support"] = rng.standard_normal((L, deg, 3))
    path = str(tmp_path / "kernels.npz")
    np.savez(path, **payload)

    from molkgnn_tpu.analyses.kernel_reader import decode_kernels, interpret_kernel

    decoded = decode_kernels(path)
    assert set(decoded) == {1, 2, 3, 4}
    assert decoded[4][0]["center"]["element"] in (
        "H C N O F Si P S Cl Br I other".split()
    )
    text = interpret_kernel(path, 4, 1)
    assert "kernel deg=4 #1" in text and "support 3" in text


def test_enantiomer_separation_detects_chirality():
    """Mirror-pair cosine < 1 for a trained-shape kgnn on a chiral graph."""
    import jax

    from molkgnn_tpu.analyses.embedding_compare import enantiomer_separation
    from molkgnn_tpu.data.synthetic import random_molgraph
    from molkgnn_tpu.graphs import batch_graphs, spec_for_graphs
    from molkgnn_tpu.models import MolKGNNNet

    rng = np.random.default_rng(5)
    graphs = [random_molgraph(rng, num_atoms=14) for _ in range(4)]
    chiral = [g for g in graphs if g.with_fields().fields[4].count > 0]
    assert chiral, "need at least one molecule with a degree-4 center"
    spec = spec_for_graphs(graphs, batch_size=1)
    # num_layers=1 so the chirality check sees the raw (pairwise-distinct)
    # input features; deeper nets mark deg-4 nodes whose identical-H
    # neighbors aggregate to equal vectors as achiral (correct semantics).
    model = MolKGNNNet(num_layers=1, kernels_1hop=(2, 3, 4, 5),
                       kernels_nhop=(2, 3, 4, 5), graph_embedding_dim=8)
    batch0 = batch_graphs([chiral[0]], spec)
    variables = model.init(jax.random.key(0), batch0)

    cosines = enantiomer_separation(
        lambda v, b: model.apply(v, b),
        variables,
        lambda g: batch_graphs([g], spec),
        [("m0", chiral[0])],
    )
    assert cosines["m0"] < 0.99999


def test_d4dchp_dataset(tmp_path):
    import csv

    from molkgnn_tpu.data.d4dchp import load_d4dchp_dataset

    smis = ["CCO", "CCC", "CCN", "CCCC", "CCOC", "CCS"]
    with open(tmp_path / "data.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["smiles", "labels"])
        for i, s in enumerate(smis):
            w.writerow([s, i % 2])
    split = np.array(
        [np.array([0, 1, 2, 3]), np.array([4]), np.array([5])],
        dtype=object,
    )
    np.save(tmp_path / "split.npy", split, allow_pickle=True)
    ds = load_d4dchp_dataset(
        str(tmp_path / "data.csv"), "CHIRAL1", str(tmp_path / "split.npy")
    )
    assert len(ds.graphs) == 6
    assert ds.metrics == ["accuracy"]
    assert len(ds.split["train"]) == 4
    assert ds.graphs[0].y in (0.0, 1.0)


def test_cli_trains_on_d4dchp(tmp_path):
    """End-to-end CLI chain for the D4DCHP family (entry.py:272-287 —
    the reference's CSV+npy-split chirality datasets, wrapper.py:246-348):
    build the expected directory layout for CHIRAL1 and train one epoch
    through `molkgnn`."""
    import csv

    base = tmp_path / "dataset" / "d4_docking"
    (base / "rs").mkdir(parents=True)
    smis = ["CCO", "CCC", "CCN", "CCCC", "CCOC", "CCS", "CNC", "COC",
            "CC(C)C", "CCCO", "CCCl", "CC(N)=O"]
    with open(base / "d4_docking_rs.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["smiles", "labels"])
        for i, s in enumerate(smis):
            w.writerow([s, i % 2])
    split = np.array(
        [np.arange(8), np.array([8, 9]), np.array([10, 11])], dtype=object
    )
    np.save(base / "rs" / "split0.npy", split, allow_pickle=True)

    run_dir = tmp_path / "run"
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.entry",
         "--dataset_name", "CHIRAL1",
         "--dataset_path", str(tmp_path / "dataset"),
         "--default_root_dir", str(run_dir), *TINY_KGNN],
        capture_output=True, text=True, timeout=500, env=_cli_env(),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    logs = run_dir / "logs"
    assert (logs / "test_result.log").exists()
    parsed = parse_test_result(str(logs / "test_result.log"))
    assert "last" in parsed and "accuracy" in parsed["last"]


def test_preprocess_driver(tmp_path):
    """Parallel cache-building driver (C17) over the smoke AID."""
    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.sdf import write_sdf
    from molkgnn_tpu.chem.smiles import parse_smiles
    from molkgnn_tpu.data.preprocess import preprocess_all

    def mk(s, seed):
        m = parse_smiles(s, add_hs=True)
        pos = embed_molecule(m, seed=seed, iterations=40)
        for i, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[i])
        return m

    raw = tmp_path / "raw"
    raw.mkdir()
    write_sdf(str(raw / "9999_actives_new.sdf"), [mk("CCO", 0), mk("CCN", 1)])
    write_sdf(str(raw / "9999_inactives_new.sdf"), [mk("CCC", 2), mk("CCS", 3)])
    records = preprocess_all(str(tmp_path), datasets=["9999"], processes=1)
    assert records[0]["status"] == "ok"
    assert records[0]["num_graphs"] == 4
    assert (tmp_path / "processed" / "kgnn-9999-3D-native.npz").exists()
    # Second run hits the cache (still ok, fast).
    records = preprocess_all(str(tmp_path), datasets=["9999"], processes=1)
    assert records[0]["status"] == "ok"


def test_cli_test_only_without_checkpoints_gives_clear_error(tmp_path):
    """--test (test-only mode) on a fresh root dir must fail with an
    actionable message, not a raw KeyError (r3 UX fix)."""
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.entry",
         "--dataset_name", "synthetic", *TINY_KGNN, "--test",
         "--default_root_dir", str(tmp_path), "--task_name", "t"],
        capture_output=True, text=True, timeout=500, env=_cli_env(),
    )
    assert r.returncode != 0
    assert "no checkpoints found" in r.stderr


def test_cli_model_parallel_halo_device_sampling(tmp_path):
    """Full CLI chain for the r4 device-resident model-parallel path:
    --model_parallel halo --device_sampling --scan_steps on a virtual
    4-device mesh trains with zero per-step host input, evaluates through
    the halo eval path, and writes the full artifact set."""
    env = dict(_cli_env())
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.entry",
         "--dataset_name", "synthetic", *TINY_KGNN,
         "--model_parallel", "halo", "--num_devices", "4",
         "--enable_oversampling_with_replacement",
         "--device_sampling", "--scan_steps", "2",
         "--default_root_dir", str(tmp_path), "--task_name", "mp"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    logs = tmp_path / "logs"
    assert (logs / "test_result.log").exists()
    parsed = parse_test_result(str(logs / "test_result.log"))
    assert "last" in parsed and "AUC" in parsed["last"]
