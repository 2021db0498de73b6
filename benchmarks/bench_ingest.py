"""Ingest benchmark at real-AID scale (VERDICT r3 item 5).

The real datasets are 60k-340k molecules (/root/reference/utils/
data_split.py:68-79) and the reference calls its receptive-field
transform "very expensive" (/root/reference/wrapper.py:562-565; it also
caches). No raw PubChem SDF is mounted in this environment, so the drill
synthesizes an AID-1798-scale SDF pair (187 actives / 61,645 inactives,
the real record counts) from ~200 embedded template molecules cycled
with fresh conformer seeds — parsing/featurization cost is per-record
and does not depend on uniqueness, so the measured rates transfer;
chemistry-quality numbers of course do not (and are not measured here).

Measures, end-to-end on this box (2-core x86):
  * cold `load_qsar_dataset`: SDF parse -> native featurization (28-d
    atoms / 7-d bonds, Gasteiger/EState/TPSA/Crippen/ASA) -> receptive
    fields -> npz cache write -> bit-identical shrink split;
  * warm load (cache hit);
  * cache size on disk; peak RSS;
  * Pool scaling of data/preprocess.py across 2 mid-size synthetic AIDs
    (processes=1 vs 2 — the reference's Pool(9) pattern,
    dataset_multigenerator.py:59-76);
  * a CLI drill: `molkgnn --dataset_name 1798` (full arg surface) training
    1 epoch on the shrink split through the jax-CPU backend, with its
    wall time and peak RSS — proving the 62k-mol dataset trains through
    the real entry point with no memory surprises.

Writes benchmarks/INGEST.json.
"""

import json
import os
import resource
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

POOL_SMILES = [
    "CCO", "CC(=O)O", "c1ccccc1", "CCN", "CCC", "CCCC", "CC(C)C",
    "CCOC", "CCS", "CNC", "COC", "CCCl", "CCBr", "CCF", "c1ccncc1",
    "CC(N)=O", "CC(C)O", "CCCO", "CCCC(=O)O", "Oc1ccccc1",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",        # ibuprofen
    "CC(=O)Oc1ccccc1C(=O)O",             # aspirin
    "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",      # caffeine
    "c1ccc2c(c1)cccc2",                  # naphthalene
    "CC(C)(C)c1ccc(O)cc1",               # BHT fragment
    "NC(=O)c1ccccc1", "OCC(O)CO", "CC(=O)NC1=CC=C(O)C=C1",  # paracetamol
    "ClC1=CC=C(C=C1)C(=O)O", "CCOC(=O)C", "CCCCCCCC", "CC1CCCCC1",
]


def _rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _pool_init(info):
    """Worker initializer (spawn context — fork after jax import can
    deadlock on XLA threads): register the bench-only AID entries."""
    import molkgnn_tpu.data.qsar as qsar_mod

    qsar_mod.DATASET_INFO.update(info)


def _pool_build(args):
    """Module-level Pool worker (closures don't pickle): fresh build of one
    synthetic AID's cache."""
    root2, aid = args
    import molkgnn_tpu.data.qsar as qsar_mod

    cpath = qsar_mod._cache_path(
        os.path.join(root2, "processed"), aid, "native", "kgnn"
    )
    if os.path.exists(cpath):
        os.remove(cpath)
    t = time.time()
    qsar_mod.load_qsar_dataset(root2, dataset=aid)
    return time.time() - t


def _gen_templates(n=200, seed0=0):
    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.smiles import parse_smiles

    out = []
    for i in range(n):
        m = parse_smiles(POOL_SMILES[i % len(POOL_SMILES)], add_hs=True)
        pos = embed_molecule(m, seed=seed0 + i, iterations=40)
        for k, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[k])
        out.append(m)
    return out


def _write_aid(root, aid, n_active, n_inactive, templates):
    """Stream an SDF pair in the reference layout (wrapper.py:410-413)."""
    from molkgnn_tpu.chem.sdf import to_molblock

    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    blocks = [to_molblock(m) for m in templates]
    for fname, n in (
        (f"{aid}_actives_new.sdf", n_active),
        (f"{aid}_inactives_new.sdf", n_inactive),
    ):
        with open(os.path.join(raw, fname), "w") as f:
            for i in range(n):
                f.write(blocks[i % len(blocks)])
                f.write("$$$$\n")


_PHASE_BUILD = """
import json, os, resource, sys, time
root, aid = sys.argv[1], sys.argv[2]
from molkgnn_tpu.data.qsar import (
    StreamingCacheWriter, _cache_path, ingest_qsar_sdf,
)
cpath = _cache_path(os.path.join(root, "processed"), aid, "native", "kgnn")
t0 = time.time()
w = StreamingCacheWriter(cpath)
_, invalid = ingest_qsar_sdf(root, aid, progress=False, writer=w)
w.close(invalid)
print(json.dumps({
    "build_s": round(time.time() - t0, 1),
    "peak_rss_mb": round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    ),
    "num_graphs": w.num_graphs,
    "num_shards": w.num_shards,
}))
"""

_CLI_SHIM = """
import json, resource, subprocess, sys
r = subprocess.run(sys.argv[1:], capture_output=True, text=True)
ru = resource.getrusage(resource.RUSAGE_CHILDREN)
print(json.dumps({
    "returncode": r.returncode,
    "peak_rss_mb": round(ru.ru_maxrss / 1024, 1),
    "stderr_tail": r.stderr[-1500:],
}))
"""


def _run_cli_drill(cmd, env, timeout):
    """Run the CLI drill through a fresh shim process whose
    RUSAGE_CHILDREN covers ONLY this command — ru_maxrss is a high-water
    mark over all reaped children, so reading it in the bench process
    would attribute the (larger) build phase's RSS to the drill."""
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", _CLI_SHIM, *cmd],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    wall = time.time() - t0
    try:
        payload = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        payload = {"returncode": r.returncode or 1,
                   "stderr_tail": (r.stdout + r.stderr)[-1500:]}
    out = {
        "returncode": payload.get("returncode", 1),
        "wall_s": round(wall, 1),
        "peak_child_rss_mb": payload.get("peak_rss_mb"),
    }
    if out["returncode"] != 0:
        out["stderr_tail"] = payload.get("stderr_tail", "")[-1500:]
    return out


_PHASE_WARM = """
import json, os, resource, sys, time
root, aid = sys.argv[1], sys.argv[2]
from molkgnn_tpu.data.qsar import load_qsar_dataset
t0 = time.time()
ds = load_qsar_dataset(root, dataset=aid)
print(json.dumps({
    "warm_load_s": round(time.time() - t0, 1),
    "peak_rss_mb": round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    ),
    "num_graphs": len(ds.graphs),
    "split_sizes": {k: int(len(v)) for k, v in ds.split.items()},
}))
"""


def scale_drill(aid="485290"):
    """Real-AID-scale ingest drill (VERDICT r4 #3): synthesize the full
    485290 record counts (278 actives / 341,026 inactives — the largest
    reference assay, utils/data_split.py:68-79), stream SDF -> features ->
    sharded cache, and prove the peak RSS stays bounded (phase-isolated
    subprocesses so each phase reports its own high-water mark). Then the
    CLI drill: 1 epoch through `molkgnn` on the shrink split. Merges a
    "scale_341k" section into INGEST.json."""
    from molkgnn_tpu.data.qsar import DATASET_INFO

    info = DATASET_INFO[aid]
    out = {
        "records": info["num_active"] + info["num_inactive"],
        "aid": aid,
    }
    root = f"/tmp/ingest_scale/{aid}/dataset/qsar/clean_sdf"
    os.makedirs(root, exist_ok=True)

    t0 = time.time()
    templates = _gen_templates()
    _write_aid(root, aid, info["num_active"], info["num_inactive"], templates)
    out["sdf_write_s"] = round(time.time() - t0, 1)
    out["sdf_bytes"] = sum(
        os.path.getsize(os.path.join(root, "raw", f))
        for f in os.listdir(os.path.join(root, "raw"))
        if f.startswith(aid)
    )

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    for key, code in (("build", _PHASE_BUILD), ("warm", _PHASE_WARM)):
        r = subprocess.run(
            [sys.executable, "-c", code, root, aid],
            capture_output=True, text=True, timeout=5400, env=env,
        )
        if r.returncode != 0:
            out[key] = {"error": r.stderr[-1500:]}
            break
        out[key] = json.loads(r.stdout.strip().splitlines()[-1])
    if "build_s" in out.get("build", {}):
        out["ingest_mols_per_s"] = round(
            out["records"] / out["build"]["build_s"], 1
        )
    cache = os.path.join(root, "processed")
    if os.path.isdir(cache):
        out["cache_bytes"] = sum(
            os.path.getsize(os.path.join(cache, f)) for f in os.listdir(cache)
        )

    run_dir = f"/tmp/ingest_scale/{aid}/run"
    out["cli_drill"] = _run_cli_drill(
        [
            sys.executable, "-m", "molkgnn_tpu.cli.entry",
            "--dataset_name", aid,
            "--dataset_path", f"/tmp/ingest_scale/{aid}/dataset",
            "--default_root_dir", run_dir,
            "--num_layers", "3", "--batch_size", "32",
            "--max_epochs", "1", "--warmup_iterations", "200",
            "--peak_lr", "5e-2",
            "--enable_oversampling_with_replacement", "--device_sampling",
            "--scan_steps", "16",
        ],
        env=env, timeout=5400,
    )
    out["cli_drill"]["test_result_exists"] = os.path.exists(
        os.path.join(run_dir, "logs", "test_result.log")
    )

    path = os.path.join(HERE, "INGEST.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged["scale_341k"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(out, indent=2))


def main():
    out = {"box": "2-core x86 (dev container)", "dataset": "1798-scale"}
    import numpy as np  # noqa: F401  (keep jax off the TPU: no jax import)

    root = "/tmp/ingest_bench/dataset/qsar/clean_sdf"
    os.makedirs(root, exist_ok=True)

    t0 = time.time()
    templates = _gen_templates()
    out["template_gen_s"] = round(time.time() - t0, 1)

    info = {"num_active": 187, "num_inactive": 61645}
    t0 = time.time()
    _write_aid(root, "1798", info["num_active"], info["num_inactive"], templates)
    out["sdf_write_s"] = round(time.time() - t0, 1)
    out["sdf_bytes"] = sum(
        os.path.getsize(os.path.join(root, "raw", f))
        for f in os.listdir(os.path.join(root, "raw"))
        if f.startswith("1798")
    )

    # Cold: parse + featurize + receptive fields + cache write + split.
    from molkgnn_tpu.data.qsar import load_qsar_dataset

    cache = os.path.join(root, "processed")
    if os.path.exists(cache):
        import shutil

        shutil.rmtree(cache)
    n_records = info["num_active"] + info["num_inactive"]
    t0 = time.time()
    ds = load_qsar_dataset(root, dataset="1798")
    cold_s = time.time() - t0
    out["cold_load_s"] = round(cold_s, 1)
    out["ingest_mols_per_s"] = round(n_records / cold_s, 1)
    out["num_graphs"] = len(ds.graphs)
    out["split_sizes"] = {k: int(len(v)) for k, v in ds.split.items()}
    out["cache_bytes"] = sum(
        os.path.getsize(os.path.join(cache, f)) for f in os.listdir(cache)
    )
    out["peak_rss_mb_after_cold"] = round(_rss_mb(), 1)

    # Warm: cache hit.
    t0 = time.time()
    ds2 = load_qsar_dataset(root, dataset="1798")
    out["warm_load_s"] = round(time.time() - t0, 1)
    assert len(ds2.graphs) == len(ds.graphs)
    del ds, ds2

    # Pool scaling across AIDs (the preprocess_all driver's regime,
    # dataset_multigenerator.py:59-76): two synthetic mid-size AIDs,
    # 1 vs 2 workers. Bench-only DATASET_INFO entries give make_split
    # matching record counts; spawn workers get them via the initializer.
    import molkgnn_tpu.data.qsar as qsar_mod

    n_half = 4000
    info = {
        aid: {"num_active": 100, "num_inactive": n_half - 100}
        for aid in ("888801", "888802")
    }
    qsar_mod.DATASET_INFO.update(info)
    root2 = "/tmp/ingest_bench2/dataset/qsar/clean_sdf"
    for aid in ("888801", "888802"):
        _write_aid(root2, aid, 100, n_half - 100, templates[:50])

    t0 = time.time()
    for aid in ("888801", "888802"):
        _pool_build((root2, aid))
    serial_s = time.time() - t0

    import multiprocessing as mp

    t0 = time.time()
    with mp.get_context("spawn").Pool(
        2, initializer=_pool_init, initargs=(info,)
    ) as pool:
        pool.map(_pool_build, [(root2, "888801"), (root2, "888802")])
    pool_s = time.time() - t0
    out["pool_scaling"] = {
        "two_aids_serial_s": round(serial_s, 1),
        "two_aids_pool2_s": round(pool_s, 1),
        "speedup": round(serial_s / pool_s, 2),
    }

    # CLI drill: the real entry point trains 1 epoch on the shrink split
    # (jax-CPU backend; the reference README example is 3 layers/batch 16,
    # README.md:81 — batch 32 keeps the drill under the step budget of
    # this 2-core box while using the same code path).
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", ""),
    )
    run_dir = "/tmp/ingest_bench/run"
    out["cli_drill"] = _run_cli_drill(
        [
            sys.executable, "-m", "molkgnn_tpu.cli.entry",
            "--dataset_name", "1798",
            "--dataset_path", "/tmp/ingest_bench/dataset",
            "--default_root_dir", run_dir,
            "--num_layers", "3", "--batch_size", "32",
            "--max_epochs", "1", "--warmup_iterations", "200",
            "--peak_lr", "5e-2",
            "--enable_oversampling_with_replacement", "--device_sampling",
            "--scan_steps", "16",
        ],
        env=env, timeout=3000,
    )
    out["cli_drill"]["test_result_exists"] = os.path.exists(
        os.path.join(run_dir, "logs", "test_result.log")
    )

    out["peak_rss_mb_final"] = round(_rss_mb(), 1)
    path = os.path.join(HERE, "INGEST.json")
    if os.path.exists(path):  # keep the scale drill's section if present
        with open(path) as f:
            prev = json.load(f)
        if "scale_341k" in prev:
            out["scale_341k"] = prev["scale_341k"]
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scale", action="store_true",
        help="run the 341k-record (AID 485290) streaming-ingest drill "
        "instead of the 1798-scale suite",
    )
    if ap.parse_args().scale:
        scale_drill()
    else:
        main()
