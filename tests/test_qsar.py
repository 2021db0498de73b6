"""QSAR dataset pipeline tests: ingest, cache, splits, invalid handling."""

import os

import numpy as np
import pytest

from molkgnn_tpu.chem.embed import embed_molecule
from molkgnn_tpu.chem.sdf import write_sdf
from molkgnn_tpu.chem.smiles import parse_smiles
from molkgnn_tpu.data.qsar import (
    ingest_qsar_sdf,
    load_graph_cache,
    load_qsar_dataset,
    make_split,
    remove_invalid_from_split,
    save_graph_cache,
    split_checksum,
)

ACTIVE_SMILES = ["CCO", "CC(=O)O", "c1ccccc1", "CCN"]
INACTIVE_SMILES = ["CCC", "CCCC", "CC(C)C", "CCOC", "CCS", "CNC", "COC", "CCCl"]


def _mol(smi, seed):
    m = parse_smiles(smi, add_hs=True)
    pos = embed_molecule(m, seed=seed, iterations=60)
    for i, a in enumerate(m.atoms):
        a.x, a.y, a.z = map(float, pos[i])
    return m


@pytest.fixture(scope="module")
def qsar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("qsar")
    raw = root / "raw"
    raw.mkdir()
    write_sdf(
        str(raw / "9999_actives_new.sdf"),
        [_mol(s, i) for i, s in enumerate(ACTIVE_SMILES)],
    )
    write_sdf(
        str(raw / "9999_inactives_new.sdf"),
        [_mol(s, 100 + i) for i, s in enumerate(INACTIVE_SMILES)],
    )
    return str(root)


def test_ingest_labels_and_counter(qsar_root):
    graphs, invalid = ingest_qsar_sdf(qsar_root, "9999", progress=False)
    assert len(graphs) == 12
    assert invalid == []
    assert [g.y for g in graphs[:4]] == [1.0] * 4
    assert [g.y for g in graphs[4:]] == [0.0] * 8
    assert [g.idx for g in graphs] == list(range(12))


def test_cache_roundtrip(qsar_root, tmp_path):
    graphs, invalid = ingest_qsar_sdf(qsar_root, "9999", progress=False)
    path = str(tmp_path / "cache.npz")
    save_graph_cache(path, graphs, invalid)
    loaded, inv2 = load_graph_cache(path)
    assert len(loaded) == len(graphs)
    assert inv2 == invalid
    for a, b in zip(graphs, loaded):
        np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        assert a.y == b.y and a.idx == b.idx


def test_sharded_cache_matches_single_file(qsar_root, tmp_path):
    """StreamingCacheWriter shards + manifest must reproduce the
    single-file cache bit-for-bit (graphs, order, invalid records) — the
    341k-scale ingest path (VERDICT r4 #3) must change memory behavior
    only, never data."""
    from molkgnn_tpu.data.qsar import (
        StreamingCacheWriter,
        load_graph_cache_sharded,
    )

    graphs, invalid = ingest_qsar_sdf(qsar_root, "9999", progress=False)
    invalid = invalid + [(99, 0)]  # exercise invalid round-trip
    cpath = str(tmp_path / "cache.npz")
    # shard_size=5 over 12 graphs -> 3 shards incl. a ragged tail.
    writer = StreamingCacheWriter(cpath, shard_size=5)
    _, inv_stream = ingest_qsar_sdf(
        qsar_root, "9999", progress=False, writer=writer
    )
    writer.close(invalid)
    assert writer.num_shards == 3 and writer.num_graphs == 12
    assert not os.path.exists(cpath)  # no single-file cache was written

    loaded, inv2 = load_graph_cache_sharded(cpath)
    assert len(loaded) == len(graphs)
    assert inv2 == invalid
    for a, b in zip(graphs, loaded):
        np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(a.p, b.p)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        np.testing.assert_array_equal(a.edge_attr, b.edge_attr)
        assert a.y == b.y and a.idx == b.idx and a.smiles == b.smiles


def test_load_qsar_dataset_streaming_path(qsar_root, tmp_path):
    """load_qsar_dataset(shard_size=N) builds + warm-loads the sharded
    cache and yields the same Dataset as the single-file path."""
    single = load_qsar_dataset(
        qsar_root, "9999", seed=2, shrink=True,
        cache_dir=str(tmp_path / "single"),
    )
    streamed = load_qsar_dataset(
        qsar_root, "9999", seed=2, shrink=True,
        cache_dir=str(tmp_path / "sharded"), shard_size=5,
    )
    assert len(streamed.graphs) == len(single.graphs)
    for part in ("train", "valid", "test"):
        np.testing.assert_array_equal(streamed.split[part], single.split[part])
    for a, b in zip(single.graphs, streamed.graphs):
        np.testing.assert_array_equal(a.x, b.x)
        assert a.y == b.y and a.idx == b.idx
    # Warm load hits the manifest (no single-file cache exists).
    assert not os.path.exists(
        os.path.join(tmp_path, "sharded", "kgnn-9999-3D-native.npz")
    )
    warm = load_qsar_dataset(
        qsar_root, "9999", seed=2, shrink=True,
        cache_dir=str(tmp_path / "sharded"), shard_size=5,
    )
    assert len(warm.graphs) == len(single.graphs)


def test_make_split_reference_semantics():
    split = make_split(37, 226, seed=2, shrink=True)
    # sizes per utils/data_split.py rounding
    assert len(split["train"]) == round(37 * 0.8) + round(226 * 0.8)
    assert len(split["valid"]) == round(37 * 0.1) + round(226 * 0.1)
    # shrink caps inactive train at 10000
    big = make_split(100, 50000, seed=2, shrink=True)
    inactive_train = [i for i in big["train"] if i >= 100]
    assert len(inactive_train) == 10000
    # deterministic given seed
    assert make_split(37, 226, seed=2, shrink=True) == split
    assert split_checksum(split) == split_checksum(
        make_split(37, 226, seed=2, shrink=True)
    )
    # disjoint parts
    all_idx = split["train"] + split["valid"] + split["test"]
    assert len(all_idx) == len(set(all_idx))


def test_reference_split_artifact_matches_regeneration():
    """Our regenerated split must be bit-identical to the shipped artifact."""
    ref = "/root/reference/data_split/shrink_9999_seed2.pt"
    if not os.path.exists(ref):
        pytest.skip("reference artifacts not mounted")
    import torch

    want = torch.load(ref, weights_only=False)
    got = make_split(37, 226, seed=2, shrink=True)
    for part in ("train", "valid", "test"):
        assert list(want[part]) == got[part], part


def test_remove_invalid_from_split():
    split = {"train": [0, 1, 2], "valid": [3], "test": [4, 5]}
    out = remove_invalid_from_split(split, [(1, 0), (4, 1)])
    assert out == {"train": [0, 2], "valid": [3], "test": [5]}
    assert split["train"] == [0, 1, 2]  # input not mutated


def test_load_qsar_dataset_end_to_end(qsar_root):
    ds = load_qsar_dataset(qsar_root, "9999", seed=2, shrink=True)
    assert ds.name == "9999"
    # Uses regenerated split for the real 9999 counts (37/226) intersected
    # with our 12 ingested molecules.
    n = sum(len(v) for v in ds.split.values())
    assert 0 < n <= 12
    # Cache file created; second load hits it.
    assert os.path.exists(
        os.path.join(qsar_root, "processed", "kgnn-9999-3D-native.npz")
    )
    ds2 = load_qsar_dataset(qsar_root, "9999", seed=2, shrink=True)
    assert len(ds2.graphs) == len(ds.graphs)


def test_save_split_checksum_matches_reference_artifact(tmp_path):
    """Round-trip our writer and compare the checksum file with the
    shipped reference sidecar."""
    ref = "/root/reference/data_split/shrink_9999_seed2.pt.checksum"
    if not os.path.exists(ref):
        pytest.skip("reference artifacts not mounted")
    from molkgnn_tpu.data.qsar import save_split

    split = make_split(37, 226, seed=2, shrink=True)
    digest = save_split(split, str(tmp_path / "shrink_9999_seed2.pt"))
    assert digest == open(ref).read().strip()
    # And the written artifact loads back identically.
    from molkgnn_tpu.data.qsar import load_reference_split

    loaded = load_reference_split(str(tmp_path / "shrink_9999_seed2.pt"))
    assert loaded == split
