"""Receptive-field extraction and batching tests."""

import numpy as np

from molkgnn_tpu.data.synthetic import random_dataset, random_molgraph
from molkgnn_tpu.graphs.batch import batch_graphs, spec_for_graphs
from molkgnn_tpu.graphs.molgraph import node_degrees, receptive_fields


def loop_receptive_fields(g):
    """Per-focal Python-loop oracle mirroring ToXAndPAndEdgeAttrForDeg
    (wrapper.py:595-672) semantics."""
    n = g.num_nodes
    src, dst = g.edge_index
    deg = np.bincount(src, minlength=n)
    out = {}
    for d in range(1, 5):
        focal = np.nonzero(deg == d)[0]
        nei_idx, nei_ea = [], []
        for f in focal:
            eids = np.nonzero(src == f)[0]  # row-major scan order
            nei_idx.append(dst[eids])
            nei_ea.append(g.edge_attr[2 * (eids // 2)])
        out[d] = (
            focal,
            np.array(nei_idx).reshape(-1, d),
            np.array(nei_ea).reshape(-1, d, g.edge_attr.shape[1]),
        )
    return out


def test_receptive_fields_match_loop_oracle():
    rng = np.random.default_rng(0)
    for _ in range(10):
        g = random_molgraph(rng)
        fields = receptive_fields(g)
        oracle = loop_receptive_fields(g)
        for d in range(1, 5):
            f, ni, ea = oracle[d]
            assert np.array_equal(fields[d].focal_index, f)
            if len(f):
                assert np.array_equal(fields[d].nei_index, ni)
                assert np.allclose(fields[d].nei_edge_attr, ea)


def test_degree_partition_covers_all_nodes():
    rng = np.random.default_rng(1)
    g = random_molgraph(rng)
    deg = node_degrees(g.edge_index, g.num_nodes)
    fields = receptive_fields(g)
    covered = np.concatenate([fields[d].focal_index for d in range(1, 5)])
    expected = np.nonzero((deg >= 1) & (deg <= 4))[0]
    assert sorted(covered.tolist()) == sorted(expected.tolist())


def test_batching_roundtrip():
    graphs = random_dataset(seed=2, num_graphs=8)
    spec = spec_for_graphs(graphs, batch_size=4)
    batch = batch_graphs(graphs[:4], spec)

    assert batch.x.shape == (spec.num_nodes, spec.node_dim)
    n_real = sum(g.num_nodes for g in graphs[:4])
    assert int(batch.node_mask.sum()) == n_real
    assert int(batch.edge_mask.sum()) == sum(g.num_edges for g in graphs[:4])
    # Node features land contiguously in pack order.
    off = 0
    for gi, g in enumerate(graphs[:4]):
        np.testing.assert_array_equal(batch.x[off : off + g.num_nodes], g.x)
        assert np.all(batch.node_graph_id[off : off + g.num_nodes] == gi)
        off += g.num_nodes
    # Per-degree bucket masks count the per-graph field sizes.
    for d in range(1, 5):
        b = batch.buckets()[d - 1]
        expect = sum(g.fields[d].count for g in graphs[:4])
        assert int(b.mask.sum()) == expect
        # Focal indices of real rows point at real nodes.
        assert np.all(batch.node_mask[b.focal_index[b.mask]])


def test_partial_batch_pads_graph_mask():
    graphs = random_dataset(seed=3, num_graphs=6)
    spec = spec_for_graphs(graphs, batch_size=4)
    batch = batch_graphs(graphs[:2], spec)
    assert int(batch.graph_mask.sum()) == 2
    assert batch.y.shape == (4,)


def test_packed_pack_equals_batch_graphs():
    from molkgnn_tpu.graphs.packed import PackedGraphs

    graphs = random_dataset(seed=11, num_graphs=24)
    spec = spec_for_graphs(graphs, batch_size=8)
    packed = PackedGraphs.from_graphs(graphs)
    ids = np.array([3, 17, 0, 9, 21, 5])  # arbitrary order, partial batch
    got = packed.pack(ids, spec)
    want = batch_graphs([graphs[i] for i in ids], spec)
    import jax

    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_pack_overflow_raises():
    from molkgnn_tpu.graphs.packed import PackedGraphs

    graphs = random_dataset(seed=12, num_graphs=16)
    spec = spec_for_graphs(graphs, batch_size=4)
    packed = PackedGraphs.from_graphs(graphs)
    import pytest

    with pytest.raises(ValueError):
        packed.pack(np.arange(16), spec)


def test_device_gather_equals_host_pack():
    import jax
    import jax.numpy as jnp

    from molkgnn_tpu.graphs.device_pack import (
        DeviceDataset,
        gather_batch,
        pad_ids,
    )
    from molkgnn_tpu.graphs.packed import PackedGraphs

    graphs = random_dataset(seed=13, num_graphs=24)
    spec = spec_for_graphs(graphs, batch_size=8)
    packed = PackedGraphs.from_graphs(graphs)
    dev = DeviceDataset.from_packed(packed)

    for ids in (np.array([5, 1, 19, 2, 8, 11, 0, 23]), np.array([7, 3])):
        want = packed.pack(ids, spec)
        got = jax.jit(gather_batch, static_argnums=2)(
            dev, jnp.asarray(pad_ids(ids, 8)), spec
        )
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(want),
        ):
            assert str(ka) == str(kb)
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=str(ka)
            )


def test_device_gather_points_equals_host_pack():
    """The 3D-family on-device assembly (graphs/device_points.gather_points)
    must be BIT-identical to the host packer (geometric.batch_points) for
    the same graphs and spec — the device_pack <-> packed.py cross-check
    extended to PointBatch, including the three index rebasings (nodes,
    triplet edge ids, quad triplet ids)."""
    import jax
    import jax.numpy as jnp

    from molkgnn_tpu.graphs.device_pack import pad_ids
    from molkgnn_tpu.graphs.device_points import (
        DevicePointDataset,
        gather_points,
    )
    from molkgnn_tpu.graphs.geometric import (
        batch_points,
        point_spec_for_graphs,
    )

    graphs = random_dataset(seed=17, num_graphs=24)
    for kw in (
        {},  # schnet regime: radius edges only
        {"with_triplets": True},  # dimenet++ regime
        {"with_torsion": True},  # spherenet regime
    ):
        spec = point_spec_for_graphs(graphs, batch_size=8, cutoff=5.0, **kw)
        dev = DevicePointDataset.from_graphs(graphs, spec)
        for ids in (np.array([5, 1, 19, 2, 8, 11, 0, 23]), np.array([7, 3])):
            want = batch_points([graphs[i] for i in ids], spec)
            got = jax.jit(gather_points, static_argnums=2)(
                dev, jnp.asarray(pad_ids(ids, 8)), spec
            )
            for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(got),
                jax.tree_util.tree_leaves_with_path(want),
            ):
                assert str(ka) == str(kb)
                assert np.asarray(a).dtype == np.asarray(b).dtype, (
                    ka, np.asarray(a).dtype, np.asarray(b).dtype
                )
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=f"{kw} {ka}"
                )
