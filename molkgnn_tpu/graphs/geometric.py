"""Geometric (3D point-cloud) batching for the SchNet/DimeNet++/SphereNet
baselines.

The reference builds radius graphs, angle triplets, and torsion quadruplets
on the GPU per batch with torch-cluster/torch-sparse C++ kernels
(/root/reference/models/SchNet/schnet.py:160, models/ChIRoNet/gnn_3D/
dimenet_pp.py:304-325, spherenet.py:49-118). On TPU those dynamic-shape
index constructions would defeat XLA, and they are *static per conformer* —
so they are computed once on the host at batch-build time, padded to
dataset-level caps, and shipped to the device as fixed-shape index arrays
with masks.

Conventions match PyG: ``radius_edges`` returns directed pairs (j, i) for
every j != i within the cutoff (source = neighbor, target = center);
triplets (k -> j -> i) enumerate, for each edge j->i, the neighbors k of j
with k != i (dimenet_pp.py:304-325).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import numpy as np

from molkgnn_tpu.graphs.molgraph import MolGraph


def molecule_geometry(
    g: MolGraph, cutoff: float, with_triplets: bool, with_torsion: bool
):
    """Per-molecule (edges, triplets, quads) with caching on the MolGraph —
    geometry is static per conformer, so each molecule pays the O(n^2) +
    enumeration cost once per (cutoff, flags), not once per batch."""
    key = (float(cutoff), bool(with_triplets), bool(with_torsion))
    cache = getattr(g, "_geom_cache", None)
    if cache is None:
        cache = {}
        g._geom_cache = cache
    hit = cache.get(key)
    if hit is not None:
        return hit
    e = radius_edges(g.p, cutoff)
    t = (
        triplet_index(e, g.num_nodes)
        if (with_triplets or with_torsion)
        else np.zeros((3, 0), np.int32)
    )
    q = (
        torsion_pairs(e, t, g.num_nodes)
        if with_torsion
        else np.zeros((2, 0), np.int32)
    )
    cache[key] = (e, t, q)
    return cache[key]


def radius_edges(pos: np.ndarray, cutoff: float) -> np.ndarray:
    """[2, E] directed (j, i) pairs with |pos_j - pos_i| < cutoff, j != i.
    Ordered by target i then source j (PyG radius_graph ordering)."""
    d = np.linalg.norm(pos[None, :, :] - pos[:, None, :], axis=-1)
    n = pos.shape[0]
    mask = (d < cutoff) & ~np.eye(n, dtype=bool)
    i_idx, j_idx = np.nonzero(mask)  # row-major: i ascending, then j
    return np.stack([j_idx, i_idx]).astype(np.int32)


def triplet_index(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """[3, T] rows (edge_kj, edge_ji, k) of angle triplets k -> j -> i.

    For each directed edge e_ji = (j -> i), enumerate incoming edges
    e_kj = (k -> j) with k != i. Row order: for ascending e_ji, ascending
    e_kj (the reference's SparseTensor row-slicing order,
    dimenet_pp.py:304-325).
    """
    src, dst = edge_index
    # incoming[j] = list of edge ids whose dst == j
    incoming: List[List[int]] = [[] for _ in range(num_nodes)]
    for eid, j in enumerate(dst):
        incoming[j].append(eid)
    rows = []
    for e_ji in range(edge_index.shape[1]):
        j, i = src[e_ji], dst[e_ji]
        for e_kj in incoming[j]:
            k = src[e_kj]
            if k != i:
                rows.append((e_kj, e_ji, k))
    if not rows:
        return np.zeros((3, 0), np.int32)
    return np.array(rows, np.int32).T


def torsion_pairs(
    edge_index: np.ndarray, triplets: np.ndarray, num_nodes: int
) -> np.ndarray:
    """[2, Q] rows (triplet_id, k_n) of torsion candidate pairs.

    For each triplet t = (k -> j -> i), the candidates are ALL in-neighbors
    k_n of j with k_n != i (k_n == k is included and yields torsion 2*pi,
    matching the reference's masking — spherenet.py:87-103). SphereNet takes
    the per-triplet minimum torsion over these candidates.
    """
    src, dst = edge_index
    incoming: List[List[int]] = [[] for _ in range(num_nodes)]
    for eid, j in enumerate(dst):
        incoming[j].append(int(src[eid]))
    rows = []
    for t in range(triplets.shape[1]):
        e_ji = triplets[1, t]
        j, i = src[e_ji], dst[e_ji]
        for k_n in incoming[j]:
            if k_n != i:
                rows.append((t, k_n))
    if not rows:
        return np.zeros((2, 0), np.int32)
    return np.array(rows, np.int32).T


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointBatch:
    """Fixed-shape batch for 3D point-cloud GNNs (z + pos + radius graph)."""

    z: jax.Array  # [N] int32 atomic numbers
    pos: jax.Array  # [N, 3]
    node_mask: jax.Array  # [N] bool
    node_graph_id: jax.Array  # [N] int32
    edge_src: jax.Array  # [E] int32 (j)
    edge_dst: jax.Array  # [E] int32 (i)
    edge_mask: jax.Array  # [E] bool
    # angle triplets k->j->i (for DimeNet++/SphereNet)
    tri_edge_kj: jax.Array  # [T] int32 edge ids
    tri_edge_ji: jax.Array  # [T] int32 edge ids
    tri_k: jax.Array  # [T] int32 node ids
    tri_mask: jax.Array  # [T] bool
    # torsion candidate pairs (for SphereNet): (triplet_id, k_n node)
    quad_t: jax.Array  # [Q] int32 triplet ids
    quad_kn: jax.Array  # [Q] int32 node ids
    quad_mask: jax.Array  # [Q] bool
    y: jax.Array  # [B]
    graph_mask: jax.Array  # [B] bool

    @property
    def num_nodes(self) -> int:
        return self.z.shape[-1]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[-1]


@dataclasses.dataclass(frozen=True)
class PointBatchSpec:
    num_graphs: int
    num_nodes: int
    num_edges: int
    num_triplets: int
    cutoff: float
    with_triplets: bool = False
    num_quads: int = 8
    with_torsion: bool = False


def point_spec_for_graphs(
    graphs: Sequence[MolGraph],
    batch_size: int,
    cutoff: float,
    with_triplets: bool = False,
    with_torsion: bool = False,
    align: int = 8,
    slack: float = 1.1,
) -> PointBatchSpec:
    def cap(values):
        top = np.sort(np.asarray(values))[::-1][:batch_size]
        v = int(np.ceil(top.sum() * slack))
        return ((max(v, 1) + align - 1) // align) * align

    nodes, edges, tris, quads = [], [], [], []
    for g in graphs:
        e, t, q = molecule_geometry(g, cutoff, with_triplets, with_torsion)
        nodes.append(g.num_nodes)
        edges.append(e.shape[1])
        if with_triplets or with_torsion:
            tris.append(t.shape[1])
            if with_torsion:
                quads.append(q.shape[1])
    return PointBatchSpec(
        num_graphs=batch_size,
        num_nodes=cap(nodes),
        num_edges=cap(edges),
        num_triplets=cap(tris) if (with_triplets or with_torsion) else 8,
        cutoff=cutoff,
        with_triplets=with_triplets or with_torsion,
        num_quads=cap(quads) if with_torsion else 8,
        with_torsion=with_torsion,
    )


def batch_points(
    graphs: Sequence[MolGraph], spec: PointBatchSpec
) -> PointBatch:
    B = spec.num_graphs
    if len(graphs) > B:
        raise ValueError(f"batch of {len(graphs)} > spec.num_graphs={B}")
    z = np.zeros((spec.num_nodes,), np.int32)
    pos = np.zeros((spec.num_nodes, 3), np.float32)
    node_mask = np.zeros((spec.num_nodes,), bool)
    gid = np.zeros((spec.num_nodes,), np.int32)
    esrc = np.zeros((spec.num_edges,), np.int32)
    edst = np.zeros((spec.num_edges,), np.int32)
    emask = np.zeros((spec.num_edges,), bool)
    tkj = np.zeros((spec.num_triplets,), np.int32)
    tji = np.zeros((spec.num_triplets,), np.int32)
    tk = np.zeros((spec.num_triplets,), np.int32)
    tmask = np.zeros((spec.num_triplets,), bool)
    qt = np.zeros((spec.num_quads,), np.int32)
    qkn = np.zeros((spec.num_quads,), np.int32)
    qmask = np.zeros((spec.num_quads,), bool)
    y = np.zeros((B,), np.float32)
    gmask = np.zeros((B,), bool)

    n_off = e_off = t_off = q_off = 0
    for bi, g in enumerate(graphs):
        e, t_all, q_all = molecule_geometry(
            g, spec.cutoff, spec.with_triplets, spec.with_torsion
        )
        n, ne = g.num_nodes, e.shape[1]
        if n_off + n > spec.num_nodes or e_off + ne > spec.num_edges:
            raise ValueError("point batch exceeds capacity")
        z[n_off : n_off + n] = g.atomic_num
        pos[n_off : n_off + n] = g.p
        node_mask[n_off : n_off + n] = True
        gid[n_off : n_off + n] = bi
        esrc[e_off : e_off + ne] = e[0] + n_off
        edst[e_off : e_off + ne] = e[1] + n_off
        emask[e_off : e_off + ne] = True
        if spec.with_triplets:
            t = t_all
            nt = t.shape[1]
            if t_off + nt > spec.num_triplets:
                raise ValueError("point batch exceeds triplet capacity")
            tkj[t_off : t_off + nt] = t[0] + e_off
            tji[t_off : t_off + nt] = t[1] + e_off
            tk[t_off : t_off + nt] = t[2] + n_off
            tmask[t_off : t_off + nt] = True
            if spec.with_torsion:
                q = q_all
                nq = q.shape[1]
                if q_off + nq > spec.num_quads:
                    raise ValueError("point batch exceeds quad capacity")
                qt[q_off : q_off + nq] = q[0] + t_off
                qkn[q_off : q_off + nq] = q[1] + n_off
                qmask[q_off : q_off + nq] = True
                q_off += nq
            t_off += nt
        y[bi] = g.y
        gmask[bi] = True
        n_off += n
        e_off += ne
    return PointBatch(
        z=z,
        pos=pos,
        node_mask=node_mask,
        node_graph_id=gid,
        edge_src=esrc,
        edge_dst=edst,
        edge_mask=emask,
        tri_edge_kj=tkj,
        tri_edge_ji=tji,
        tri_k=tk,
        tri_mask=tmask,
        quad_t=qt,
        quad_kn=qkn,
        quad_mask=qmask,
        y=y,
        graph_mask=gmask,
    )
