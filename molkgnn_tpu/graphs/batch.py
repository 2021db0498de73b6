"""Static-shape batched graphs for XLA.

A ``GraphBatch`` is the device-side pytree: B molecules packed into one
disjoint-union graph, padded to a fixed ``BatchSpec`` so every training step
compiles exactly once. This replaces PyG's dynamic-shape ``Batch`` collation
(/root/reference/wrapper.py:541-556) with a TPU-first layout:

  * nodes:   [N_pad] with ``node_mask``; padded rows are all-zero.
  * edges:   [E_pad] src/dst index arrays (COO, both bond directions) with
             ``edge_mask``; padded edges point at node 0 but carry zero weight.
  * degree buckets: for d in 1..4, fixed-capacity receptive fields
             (focal/neighbor indices into the packed node array) with masks —
             the padded analogue of ``ToXAndPAndEdgeAttrForDeg`` outputs
             (/root/reference/wrapper.py:637-672).
  * graphs:  [B] labels + mask; ``node_graph_id`` drives segment-sum pooling.

Sharding note: every leading axis (nodes, edges, buckets, graphs) is padded
per *sub-batch*, so stacking `ndev` GraphBatches gives [ndev, ...] arrays that
shard trivially over a device mesh for data parallelism (see parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np

from molkgnn_tpu.graphs.molgraph import MAX_DEGREE, MolGraph


def _round_up(x: int, m: int) -> int:
    return ((max(int(x), 1) + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DegreeBucket:
    """Padded receptive field of all degree-d nodes in the batch."""

    focal_index: jax.Array  # [M] int32 into packed nodes (0 where padded)
    nei_index: jax.Array  # [M, d] int32 into packed nodes (0 where padded)
    nei_edge_attr: jax.Array  # [M, d, Fe] float32 (zeros where padded)
    mask: jax.Array  # [M] bool

    @property
    def capacity(self) -> int:
        return self.focal_index.shape[-1]

    @property
    def deg(self) -> int:
        return self.nei_index.shape[-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GraphBatch:
    """One fixed-shape batch of molecules (a pytree of jax/np arrays)."""

    x: jax.Array  # [N, F] node features
    p: jax.Array  # [N, D] positions
    node_mask: jax.Array  # [N] bool
    node_graph_id: jax.Array  # [N] int32 in [0, B)
    edge_src: jax.Array  # [E] int32
    edge_dst: jax.Array  # [E] int32
    edge_attr: jax.Array  # [E, Fe]
    edge_mask: jax.Array  # [E] bool
    deg1: DegreeBucket
    deg2: DegreeBucket
    deg3: DegreeBucket
    deg4: DegreeBucket
    y: jax.Array  # [B] float32 labels
    graph_mask: jax.Array  # [B] bool

    @property
    def num_nodes(self) -> int:
        return self.x.shape[-2]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[-1]

    def buckets(self):
        return (self.deg1, self.deg2, self.deg3, self.deg4)


@dataclasses.dataclass(frozen=True)
class BatchSpec:
    """Static capacities; one compiled program per distinct spec."""

    num_graphs: int
    num_nodes: int
    num_edges: int
    deg_capacity: tuple  # (M1, M2, M3, M4)
    node_dim: int = 28
    edge_dim: int = 7
    pos_dim: int = 3

    def validate(self):
        assert len(self.deg_capacity) == MAX_DEGREE


def spec_for_graphs(
    graphs: Sequence[MolGraph],
    batch_size: int,
    node_align: int = 8,
    slack: float = 1.1,
) -> BatchSpec:
    """Derive capacities that fit any ``batch_size`` molecules drawn from
    ``graphs`` (max-k sum heuristic with ``slack`` headroom, aligned up)."""

    def cap(values: np.ndarray) -> int:
        top = np.sort(values)[::-1][:batch_size]
        return _round_up(int(np.ceil(top.sum() * slack)), node_align)

    nodes = np.array([g.num_nodes for g in graphs])
    edges = np.array([g.num_edges for g in graphs])
    degs = []
    for d in range(1, MAX_DEGREE + 1):
        degs.append(
            cap(np.array([g.with_fields().fields[d].count for g in graphs]))
        )
    g0 = graphs[0]
    return BatchSpec(
        num_graphs=batch_size,
        num_nodes=cap(nodes),
        num_edges=cap(edges),
        deg_capacity=tuple(degs),
        node_dim=int(g0.x.shape[1]),
        edge_dim=int(g0.edge_attr.shape[1]),
        pos_dim=int(g0.p.shape[1]),
    )


def _pad_concat(arrays, total: int, name: str) -> np.ndarray:
    """Concatenate then zero-pad axis 0 to ``total`` (single C-level copy)."""
    cat = np.concatenate(arrays, axis=0) if arrays else None
    if cat is None:
        shape = (total,)
        return np.zeros(shape, np.float32)
    if cat.shape[0] > total:
        raise ValueError(
            f"batch exceeds {name} capacity ({cat.shape[0]} > {total})"
        )
    pad = np.zeros((total - cat.shape[0],) + cat.shape[1:], cat.dtype)
    return np.concatenate([cat, pad], axis=0)


def batch_graphs(graphs: Sequence[MolGraph], spec: BatchSpec) -> GraphBatch:
    """Pack molecules into one padded GraphBatch (host-side numpy).

    Node indices are offset per molecule (disjoint union). Raises if the batch
    exceeds any static capacity — capacities are a dataset property computed
    once by ``spec_for_graphs``; overflow means the spec is stale.

    Implementation is fully vectorized (per-field concatenate + one pad):
    the packer runs once per training step on the host, so its cost bounds
    end-to-end throughput.
    """
    B = spec.num_graphs
    if len(graphs) > B:
        raise ValueError(f"batch of {len(graphs)} > spec.num_graphs={B}")

    graphs = [g.with_fields() for g in graphs]
    counts = np.array([g.num_nodes for g in graphs], np.int64)
    n_offsets = np.concatenate([[0], np.cumsum(counts)])
    if n_offsets[-1] > spec.num_nodes:
        raise ValueError("batch exceeds node/edge capacity")

    x = _pad_concat([g.x for g in graphs], spec.num_nodes, "node")
    p = _pad_concat([g.p for g in graphs], spec.num_nodes, "node")
    node_mask = np.arange(spec.num_nodes) < n_offsets[-1]
    node_graph_id = _pad_concat(
        [
            np.full(g.num_nodes, gi, np.int32)
            for gi, g in enumerate(graphs)
        ],
        spec.num_nodes,
        "node",
    ).astype(np.int32)

    e_counts = np.array([g.num_edges for g in graphs], np.int64)
    e_total = int(e_counts.sum())
    edge_pair = _pad_concat(
        [
            (g.edge_index + n_offsets[gi]).astype(np.int32).T
            for gi, g in enumerate(graphs)
        ],
        spec.num_edges,
        "edge",
    ).astype(np.int32)
    edge_src, edge_dst = edge_pair[:, 0], edge_pair[:, 1]
    edge_attr = _pad_concat(
        [g.edge_attr for g in graphs], spec.num_edges, "edge"
    )
    edge_mask = np.arange(spec.num_edges) < e_total

    y = np.zeros((B,), np.float32)
    y[: len(graphs)] = [g.y for g in graphs]
    graph_mask = np.arange(B) < len(graphs)

    caps = spec.deg_capacity
    buckets = []
    for d in range(MAX_DEGREE):
        fs = [g.fields[d + 1] for g in graphs]
        total = sum(f.count for f in fs)
        cap = caps[d]
        if total > cap:
            raise ValueError(f"batch exceeds degree-{d + 1} capacity")
        focal = _pad_concat(
            [
                (f.focal_index + n_offsets[gi]).astype(np.int32)
                for gi, f in enumerate(fs)
                if f.count
            ]
            or [np.zeros((0,), np.int32)],
            cap,
            f"deg{d + 1}",
        ).astype(np.int32)
        nei = _pad_concat(
            [
                (f.nei_index + n_offsets[gi]).astype(np.int32)
                for gi, f in enumerate(fs)
                if f.count
            ]
            or [np.zeros((0, d + 1), np.int32)],
            cap,
            f"deg{d + 1}",
        ).astype(np.int32)
        if nei.ndim == 1:
            nei = nei.reshape(cap, d + 1) if cap else nei
        nei_ea = _pad_concat(
            [f.nei_edge_attr for f in fs if f.count]
            or [np.zeros((0, d + 1, spec.edge_dim), np.float32)],
            cap,
            f"deg{d + 1}",
        )
        if nei_ea.ndim == 1:
            nei_ea = nei_ea.reshape(cap, d + 1, spec.edge_dim)
        buckets.append(
            DegreeBucket(
                focal_index=focal,
                nei_index=nei,
                nei_edge_attr=nei_ea,
                mask=np.arange(cap) < total,
            )
        )
    return GraphBatch(
        x=x,
        p=p,
        node_mask=node_mask,
        node_graph_id=node_graph_id,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        deg1=buckets[0],
        deg2=buckets[1],
        deg3=buckets[2],
        deg4=buckets[3],
        y=y,
        graph_mask=graph_mask,
    )
