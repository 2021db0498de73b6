"""Full-length quality runs at AID scale (VERDICT r4 #4).

The closest legal stand-in for the real-AID reproduction (no PubChem SDF
is mounted in any environment seen so far): the full AID-1798 record
counts (187 actives / 61,645 inactives — /root/reference/utils/
data_split.py:68-79) with STRUCTURAL labels, run through the real
`molkgnn` CLI at flagship hyperparams (Supplement Table 3 /
MolKGNNNet.py:162-174): 4 layers, kernels 10/20/30/50, hidden 32,
dropout 0.2, warmup 300, peak LR 5e-3, end 1e-10, weight decay 1e-3,
20 epochs; batch 32 with oversampling (the b16-b32 semantics of the
search space, Supplement Table 2). jax-CPU backend (the TPU link has
been degraded for every recent window; the loop is identical).

Two tasks, two difficulty regimes:

* ``scaffold``: actives drawn from a disjoint drug-like template pool,
  inactives from small aliphatics. Separable from the 28-d features —
  the model saturates within epoch 0 (logAUC 1.0), which proves the
  full-scale pipeline end-to-end but shows no learning dynamics.
* ``enantiomer``: every inactive is an EXACT MIRROR conformer of the
  active scaffolds (same atoms, bonds, distances, angles — handedness
  normalized at the stereocenter via the signed substituent volume, so
  label == chirality sign and nothing else). Only the kernel conv's
  chirality machinery (the reference's core contribution) can separate
  the classes; the learning curve is real evidence. Config note
  (measured, /tmp-scale diagnosis in this round's log): the 4-layer
  flagship plateaus at AUC ~0.55 on PURE-chirality labels while a
  1-layer model learns them to AUC ~0.9 — the chirality score acts on
  the LAST layer's neighbor features, which deep message passing has
  already mixed molecule-wide. The task therefore runs the 1-layer
  configuration (depth is inside the reference's search space,
  Supplement Table 2 layers {1-5}); the 4-layer null result is kept in
  the artifact as flagship_enantiomer.

Success bar: test logAUC[0.001,0.1] well above the 0.0215 random floor
at full dataset scale and full epoch count.

Writes benchmarks/QUALITY_RUN.json + copies history.json /
test_result.log into benchmarks/quality_run/<task>/.
"""

import copy
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

N_ACTIVE, N_INACTIVE = 187, 61645  # AID 1798 (utils/data_split.py:68-79)

# Disjoint scaffold pools (task "scaffold"): drug-like actives vs small
# aliphatic inactives — the model must separate them from features alone.
ACTIVE_SMILES = [
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",    # ibuprofen
    "CC(=O)Oc1ccccc1C(=O)O",         # aspirin
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",  # caffeine
    "CC(=O)NC1=CC=C(O)C=C1",         # paracetamol
    "ClC1=CC=C(C=C1)C(=O)O",
    "NC(=O)c1ccccc1",
    "CC(C)(C)c1ccc(O)cc1",
    "Oc1ccccc1",
]
INACTIVE_SMILES = [
    "CCO", "CC(=O)O", "CCN", "CCC", "CCCC", "CC(C)C", "CCOC", "CCS",
    "CNC", "COC", "CCCl", "CCBr", "CCF", "CC(N)=O", "CC(C)O", "CCCO",
    "CCCC(=O)O", "CCOC(=O)C", "CCCCCCCC", "CC1CCCCC1", "OCC(O)CO",
]

# Chiral scaffolds (task "enantiomer"): one carbon with four
# pairwise-distinct-element substituents, so the stereocenter and a
# canonical substituent order are unambiguous.
CHIRAL_SMILES = [
    "FC(Cl)Br", "CC(F)Cl", "CC(N)O", "NC(F)Cl",
    "CC(O)F", "OC(F)Cl", "CC(Br)Cl", "CC(N)F",
]


def _embed(smi, seed, iterations=60):
    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.smiles import parse_smiles

    m = parse_smiles(smi, add_hs=True)
    pos = embed_molecule(m, seed=seed, iterations=iterations)
    return m, np.asarray(pos, float)


def _with_pos(m, pos):
    mm = copy.deepcopy(m)
    for k, a in enumerate(mm.atoms):
        a.x, a.y, a.z = map(float, pos[k])
    return mm


def _chiral_pair(smi, seed):
    """(plus, minus): an embedded conformer normalized to + handedness at
    its stereocenter, and its exact mirror image. Handedness = sign of the
    substituent triple product in atomic-number order, so the label
    correlates with chirality and nothing else (mirroring preserves every
    distance and angle)."""
    from molkgnn_tpu.chem import periodic

    m, pos = _embed(smi, seed)
    center, order = None, None
    for i in range(len(m.atoms)):
        nb = [a for a, _ in m.neighbors(i)]
        if len(nb) == 4:
            zs = [periodic.atomic_number(m.atoms[a].symbol) for a in nb]
            if len(set(zs)) == 4:
                center = i
                order = [a for _, a in sorted(zip(zs, nb))]
                break
    assert center is not None, f"no unambiguous stereocenter in {smi}"
    a, b, c, d = (pos[j] for j in order)
    if float(np.dot(np.cross(b - a, c - a), d - a)) < 0:
        pos = pos * np.array([-1.0, 1.0, 1.0])
    mirror = pos * np.array([-1.0, 1.0, 1.0])
    return _with_pos(m, pos), _with_pos(m, mirror)


def _write_sdf_cycle(path, mols, n):
    from molkgnn_tpu.chem.sdf import to_molblock

    blocks = [to_molblock(m) for m in mols]
    with open(path, "w") as f:
        for i in range(n):
            f.write(blocks[i % len(blocks)])
            f.write("$$$$\n")


def _parse_test_result(text):
    out, section = {}, None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1]
            out[section] = {}
        elif ":" in line and section is not None:
            k, v = line.split(":", 1)
            out[section][k.strip()] = float(v.strip())
    return out


def _build_scaffold_sdfs(raw):
    act = []
    for i in range(64):
        m, pos = _embed(ACTIVE_SMILES[i % len(ACTIVE_SMILES)], 1000 + i, 40)
        act.append(_with_pos(m, pos))
    inact = []
    for i in range(200):
        m, pos = _embed(INACTIVE_SMILES[i % len(INACTIVE_SMILES)], i, 40)
        inact.append(_with_pos(m, pos))
    _write_sdf_cycle(os.path.join(raw, "1798_actives_new.sdf"), act, N_ACTIVE)
    _write_sdf_cycle(
        os.path.join(raw, "1798_inactives_new.sdf"), inact, N_INACTIVE
    )


def _build_enantiomer_sdfs(raw):
    plus, minus = [], []
    for i in range(200):
        p, q = _chiral_pair(CHIRAL_SMILES[i % len(CHIRAL_SMILES)], seed=i)
        plus.append(p)
        minus.append(q)
    _write_sdf_cycle(os.path.join(raw, "1798_actives_new.sdf"), plus, N_ACTIVE)
    _write_sdf_cycle(
        os.path.join(raw, "1798_inactives_new.sdf"), minus, N_INACTIVE
    )


def run_task(task, build_sdfs, model_args=None, config_note=None,
             max_epochs=20):
    out = {
        "box": "2-core x86 (dev container), jax-CPU backend",
        "records": N_ACTIVE + N_INACTIVE,
        "config": config_note
        or "flagship: 4 layers, kernels 10/20/30/50, hidden 32, "
        "dropout 0.2, b32+oversampling, warmup 300, peak 5e-3, 20 epochs",
        "random_floor_logAUC": 0.0215,
    }
    base = f"/tmp/quality_run/{task}"
    if os.path.isdir(base):
        shutil.rmtree(base)
    root = os.path.join(base, "dataset", "qsar", "clean_sdf")
    raw = os.path.join(root, "raw")
    run_dir = os.path.join(base, "run")
    os.makedirs(raw, exist_ok=True)

    t0 = time.time()
    build_sdfs(raw)
    out["sdf_write_s"] = round(time.time() - t0, 1)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    t0 = time.time()
    r = subprocess.run(
        [
            sys.executable, "-m", "molkgnn_tpu.cli.entry",
            "--dataset_name", "1798",
            "--dataset_path", os.path.join(base, "dataset"),
            "--default_root_dir", run_dir,
            "--batch_size", "32", "--max_epochs", str(max_epochs),
            "--warmup_iterations", "300",
            "--enable_oversampling_with_replacement", "--device_sampling",
            "--scan_steps", "16",
        ]
        + (
            model_args
            or ["--hidden_dim", "32", "--num_layers", "4",
                "--dropout_ratio", "0.2", "--peak_lr", "5e-3"]
        ),
        env=env, capture_output=True, text=True, timeout=13000,
    )
    out["wall_s"] = round(time.time() - t0, 1)
    out["returncode"] = r.returncode
    if r.returncode != 0:
        out["stderr_tail"] = r.stderr[-2000:]

    logs = os.path.join(run_dir, "logs")
    hist_path = os.path.join(logs, "history.json")
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
        out["epochs_completed"] = len(hist)
        for key, name in (
            ("logAUC_0.001_0.1", "curve_logAUC_0.001_0.1"),
            ("AUC", "curve_AUC"),
            ("loss", "curve_loss"),
        ):
            out[name] = [round(h.get(key, float("nan")), 4) for h in hist]
    tr_path = os.path.join(logs, "test_result.log")
    if os.path.exists(tr_path):
        with open(tr_path) as f:
            out["test_result"] = _parse_test_result(f.read())

    keep = os.path.join(HERE, "quality_run", task)
    os.makedirs(keep, exist_ok=True)
    for f in ("history.json", "test_result.log", "task_info.log"):
        src = os.path.join(logs, f)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(keep, f))
    return out


ENANT_ARGS = [
    "--hidden_dim", "32", "--num_layers", "1", "--dropout_ratio", "0.0",
    "--ffn_dropout_rate", "0.0", "--peak_lr", "1e-2",
]
ENANT_NOTE = (
    "1 layer, kernels 10/20/30/50, hidden 32, no dropout, peak 1e-2, "
    "b32+oversampling, 20 epochs — pure-chirality labels need a shallow "
    "model (see module docstring); depth is inside the reference search "
    "space (Supplement Table 2)"
)

# Cross-family scientific comparison on the SAME enantiomer dataset (the
# reference's core claim is chirality-awareness vs 3D baselines,
# README.md:4): ChIRoNet is chirality-aware (geometry-derived R/S node
# tags + torsion phase encoders — how the reference's ChIRo gets its
# signal too) and must separate the mirror pairs; SchNet is E(3)-invariant
# over interatomic distances, which mirroring preserves exactly, so its
# AUC must stay at the 0.5 coin-flip — a null CONTROL proving the
# separation above is chirality, not leakage. Short epoch budgets: the
# chironet signal is feature-visible (saturates early) and the schnet
# null does not move with more epochs.
CHIRONET_ARGS = [
    "--gnn_type", "chironet", "--F_H", "32", "--F_H_EConv", "32",
    "--GAT_N_heads", "2", "--dropout", "0.0",
    "--ffn_dropout_rate", "0.0", "--peak_lr", "1e-3",
]
CHIRONET_NOTE = (
    "ChIRoNet F_H 32, 2 GAT heads, no dropout, peak 1e-3, "
    "b32+oversampling, 6 epochs — chirality-aware baseline, expected to "
    "separate enantiomers (geometry-derived R/S tags + torsion encoders)"
)
SCHNET_ARGS = [
    "--gnn_type", "schnet", "--num_layers", "3",
    "--hidden_channels", "32", "--num_filters", "32",
    "--num_gaussians", "25", "--out_channels", "16",
    "--ffn_dropout_rate", "0.0", "--peak_lr", "1e-3",
]
SCHNET_NOTE = (
    "SchNet 3 layers, hidden 32, peak 1e-3, b32+oversampling, 6 epochs — "
    "E(3)-invariant null control: mirror pairs have identical distance "
    "sets, so AUC must stay ~0.5"
)


# SphereNet is the geometry-only positive: its torsion channel (the one
# the 3DGN trio's other two lack) sees phi -> -phi under mirror, with NO
# R/S tags in its input (z+pos only) — the hardest legitimate path to
# the label. DimeNet++ is the second null: distances AND angles are both
# mirror-invariant, so its entire basis carries zero class signal.
SPHERENET_ARGS = [
    "--gnn_type", "spherenet", "--cutoff", "5.0", "--num_layers", "2",
    "--hidden_channels", "32", "--out_channels", "16",
    "--int_emb_size", "16", "--basis_emb_size_dist", "8",
    "--basis_emb_size_angle", "8", "--basis_emb_size_torsion", "8",
    "--out_emb_channels", "32", "--num_spherical", "3",
    "--num_radial", "4", "--num_before_skip", "1",
    "--num_after_skip", "1", "--num_output_layers", "1",
    "--ffn_dropout_rate", "0.0", "--peak_lr", "2e-3",
]
SPHERENET_NOTE = (
    "SphereNet 2 layers, hidden 32, sph 3 / rad 4, peak 2e-3, "
    "b32+oversampling, 12 epochs — geometry-only positive: only the "
    "torsion channel (phi -> -phi under mirror) can separate; no R/S "
    "tags in its z+pos input"
)
DIMENET_ARGS = [
    "--gnn_type", "dimenet_pp", "--cutoff", "5.0", "--num_blocks", "2",
    "--hidden_channels", "32", "--out_channels", "16",
    "--int_emb_size", "16", "--basis_emb_size", "8",
    "--out_emb_channels", "32", "--num_spherical", "3",
    "--num_radial", "4", "--num_before_skip", "1",
    "--num_after_skip", "1", "--num_output_layers", "1",
    "--ffn_dropout_rate", "0.0", "--peak_lr", "1e-3",
]
DIMENET_NOTE = (
    "DimeNet++ 2 blocks, hidden 32, sph 3 / rad 4, peak 1e-3, "
    "b32+oversampling, 6 epochs — second null control: distances and "
    "angles are both mirror-invariant, the full basis carries zero "
    "class signal"
)


TASKS = {
    "scaffold": (_build_scaffold_sdfs, None, None, 20),
    "enantiomer": (_build_enantiomer_sdfs, ENANT_ARGS, ENANT_NOTE, 20),
    "enantiomer_chironet": (
        _build_enantiomer_sdfs, CHIRONET_ARGS, CHIRONET_NOTE, 6
    ),
    "enantiomer_schnet": (
        _build_enantiomer_sdfs, SCHNET_ARGS, SCHNET_NOTE, 6
    ),
    "enantiomer_spherenet": (
        _build_enantiomer_sdfs, SPHERENET_ARGS, SPHERENET_NOTE, 12
    ),
    "enantiomer_dimenet_pp": (
        _build_enantiomer_sdfs, DIMENET_ARGS, DIMENET_NOTE, 6
    ),
}


def main(only=None):
    results = {}
    if os.path.exists(os.path.join(HERE, "QUALITY_RUN.json")):
        with open(os.path.join(HERE, "QUALITY_RUN.json")) as f:
            results = json.load(f)
    for task, (builder, margs, note, epochs) in TASKS.items():
        if only and task != only:
            continue
        print(f"=== task {task}", flush=True)
        results[task] = run_task(task, builder, margs, note, epochs)
        print(json.dumps(results[task], indent=2), flush=True)
    with open(os.path.join(HERE, "QUALITY_RUN.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main(only=sys.argv[1] if len(sys.argv) > 1 else None)
