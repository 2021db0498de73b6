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


def batch_graphs(graphs: Sequence[MolGraph], spec: BatchSpec) -> GraphBatch:
    """Pack molecules into one padded GraphBatch (host-side numpy).

    Node indices are offset per molecule (disjoint union). Raises if the batch
    exceeds any static capacity — capacities are a dataset property computed
    once by ``spec_for_graphs``; overflow means the spec is stale.
    """
    B = spec.num_graphs
    if len(graphs) > B:
        raise ValueError(f"batch of {len(graphs)} > spec.num_graphs={B}")

    x = np.zeros((spec.num_nodes, spec.node_dim), np.float32)
    p = np.zeros((spec.num_nodes, spec.pos_dim), np.float32)
    node_mask = np.zeros((spec.num_nodes,), bool)
    node_graph_id = np.zeros((spec.num_nodes,), np.int32)
    edge_src = np.zeros((spec.num_edges,), np.int32)
    edge_dst = np.zeros((spec.num_edges,), np.int32)
    edge_attr = np.zeros((spec.num_edges, spec.edge_dim), np.float32)
    edge_mask = np.zeros((spec.num_edges,), bool)
    y = np.zeros((B,), np.float32)
    graph_mask = np.zeros((B,), bool)

    caps = spec.deg_capacity
    focal = [np.zeros((caps[d],), np.int32) for d in range(MAX_DEGREE)]
    nei = [
        np.zeros((caps[d], d + 1), np.int32) for d in range(MAX_DEGREE)
    ]
    nei_ea = [
        np.zeros((caps[d], d + 1, spec.edge_dim), np.float32)
        for d in range(MAX_DEGREE)
    ]
    bmask = [np.zeros((caps[d],), bool) for d in range(MAX_DEGREE)]

    n_off = 0
    e_off = 0
    d_off = [0] * MAX_DEGREE
    for gi, g in enumerate(graphs):
        g = g.with_fields()
        n, e = g.num_nodes, g.num_edges
        if n_off + n > spec.num_nodes or e_off + e > spec.num_edges:
            raise ValueError("batch exceeds node/edge capacity")
        x[n_off : n_off + n] = g.x
        p[n_off : n_off + n] = g.p
        node_mask[n_off : n_off + n] = True
        node_graph_id[n_off : n_off + n] = gi
        edge_src[e_off : e_off + e] = g.edge_index[0] + n_off
        edge_dst[e_off : e_off + e] = g.edge_index[1] + n_off
        edge_attr[e_off : e_off + e] = g.edge_attr
        edge_mask[e_off : e_off + e] = True
        y[gi] = g.y
        graph_mask[gi] = True
        for d in range(MAX_DEGREE):
            f = g.fields[d + 1]
            c = f.count
            if c == 0:
                continue
            o = d_off[d]
            if o + c > caps[d]:
                raise ValueError(f"batch exceeds degree-{d + 1} capacity")
            focal[d][o : o + c] = f.focal_index + n_off
            nei[d][o : o + c] = f.nei_index + n_off
            nei_ea[d][o : o + c] = f.nei_edge_attr
            bmask[d][o : o + c] = True
            d_off[d] = o + c
        n_off += n
        e_off += e

    buckets = [
        DegreeBucket(
            focal_index=focal[d],
            nei_index=nei[d],
            nei_edge_attr=nei_ea[d],
            mask=bmask[d],
        )
        for d in range(MAX_DEGREE)
    ]
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
