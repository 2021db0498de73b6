"""Fixed-shape batching for ChIRoNet (internal-coordinate graphs).

Packs per-molecule node/edge tensors plus the distance/angle/dihedral path
index arrays and the local-structure (central-bond) grouping into one padded
batch — the reference computes ``get_local_structure_map`` on the host per
batch (ChIRoNet.py:45-50); here it is precomputed per molecule and offset at
pack time. Angles and dihedrals arrive mod 2*pi (wrapper.py:485-486).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import numpy as np

from molkgnn_tpu.chem.chiro_features import (
    chiro_edge_features,
    chiro_node_features,
    internal_coordinates,
    local_structure_map,
)
from molkgnn_tpu.chem.mol import Molecule


@dataclasses.dataclass
class ChiroGraph:
    """One molecule, chiro-featurized (host-side)."""

    x: np.ndarray  # [N, 52]
    edge_index: np.ndarray  # [2, E]
    edge_attr: np.ndarray  # [E, 14]
    distances: np.ndarray  # [D]
    distance_index: np.ndarray  # [D, 2]
    angles: np.ndarray  # [P]
    angle_index: np.ndarray  # [P, 3]
    dihedrals: np.ndarray  # [S]
    dihedral_index: np.ndarray  # [S, 4]
    ls_map: np.ndarray  # [S]
    alpha_index: np.ndarray  # [2, A]
    y: float = 0.0
    idx: int = -1
    smiles: str = ""

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]


def mol_to_chiro_graph(
    mol: Molecule, y: float = 0.0, idx: int = -1, smiles: str = ""
) -> Optional[ChiroGraph]:
    """Reference chiro_process (wrapper.py:475-502): returns None when the
    molecule has no dihedral paths."""
    try:
        coords = internal_coordinates(mol)
        if coords is None:
            return None
        distances, d_idx, angles, a_idx, dihedrals, s_idx = coords
        edge_index, edge_attr = chiro_edge_features(mol)
        x = chiro_node_features(mol)
        ls_map, alpha = local_structure_map(s_idx)
        return ChiroGraph(
            x=x,
            edge_index=edge_index,
            edge_attr=edge_attr,
            distances=distances,
            distance_index=d_idx,
            angles=(angles % (2 * np.pi)).astype(np.float32),
            angle_index=a_idx,
            dihedrals=(dihedrals % (2 * np.pi)).astype(np.float32),
            dihedral_index=s_idx,
            ls_map=ls_map,
            alpha_index=alpha,
            y=y,
            idx=idx,
            smiles=smiles,
        )
    except Exception:
        return None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChiroBatch:
    x: jax.Array  # [N, 52]
    node_mask: jax.Array  # [N] bool
    node_graph_id: jax.Array  # [N]
    edge_src: jax.Array  # [E]
    edge_dst: jax.Array  # [E]
    edge_attr: jax.Array  # [E, 14]
    edge_mask: jax.Array  # [E]
    distances: jax.Array  # [D]
    dist_i: jax.Array  # [D]
    dist_j: jax.Array  # [D]
    dist_mask: jax.Array  # [D]
    angles: jax.Array  # [P]
    ang_i: jax.Array
    ang_j: jax.Array
    ang_k: jax.Array
    ang_mask: jax.Array
    dihedrals: jax.Array  # [S]
    dih_i: jax.Array
    dih_j: jax.Array
    dih_k: jax.Array
    dih_l: jax.Array
    dih_mask: jax.Array
    ls_map: jax.Array  # [S] -> alpha rows
    alpha_x: jax.Array  # [A]
    alpha_y: jax.Array  # [A]
    alpha_mask: jax.Array  # [A]
    y: jax.Array  # [B]
    graph_mask: jax.Array  # [B]

    @property
    def num_nodes(self) -> int:
        return self.x.shape[-2]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[-1]


@dataclasses.dataclass(frozen=True)
class ChiroBatchSpec:
    num_graphs: int
    num_nodes: int
    num_edges: int
    num_dist: int
    num_angles: int
    num_dihedrals: int
    num_alpha: int
    node_dim: int = 52
    edge_dim: int = 14


def chiro_spec_for_graphs(
    graphs: Sequence[ChiroGraph], batch_size: int, align: int = 8,
    slack: float = 1.1,
) -> ChiroBatchSpec:
    def cap(vals):
        top = np.sort(np.asarray(vals))[::-1][:batch_size]
        v = int(np.ceil(top.sum() * slack))
        return ((max(v, 1) + align - 1) // align) * align

    return ChiroBatchSpec(
        num_graphs=batch_size,
        num_nodes=cap([g.num_nodes for g in graphs]),
        num_edges=cap([g.edge_index.shape[1] for g in graphs]),
        num_dist=cap([g.distances.shape[0] for g in graphs]),
        num_angles=cap([g.angles.shape[0] for g in graphs]),
        num_dihedrals=cap([g.dihedrals.shape[0] for g in graphs]),
        num_alpha=cap([g.alpha_index.shape[1] for g in graphs]),
    )


def batch_chiro(graphs: Sequence[ChiroGraph], spec: ChiroBatchSpec) -> ChiroBatch:
    B = spec.num_graphs
    if len(graphs) > B:
        raise ValueError(f"batch of {len(graphs)} > spec.num_graphs={B}")
    z = lambda n, dt=np.float32: np.zeros(n, dt)
    x = z((spec.num_nodes, spec.node_dim))
    node_mask = z((spec.num_nodes,), bool)
    gid = z((spec.num_nodes,), np.int32)
    esrc = z((spec.num_edges,), np.int32)
    edst = z((spec.num_edges,), np.int32)
    eattr = z((spec.num_edges, spec.edge_dim))
    emask = z((spec.num_edges,), bool)
    dists = z((spec.num_dist,))
    di = z((spec.num_dist,), np.int32)
    dj = z((spec.num_dist,), np.int32)
    dmask = z((spec.num_dist,), bool)
    angs = z((spec.num_angles,))
    ai = z((spec.num_angles,), np.int32)
    aj = z((spec.num_angles,), np.int32)
    ak = z((spec.num_angles,), np.int32)
    amask = z((spec.num_angles,), bool)
    dihs = z((spec.num_dihedrals,))
    si = z((spec.num_dihedrals,), np.int32)
    sj = z((spec.num_dihedrals,), np.int32)
    sk = z((spec.num_dihedrals,), np.int32)
    sl = z((spec.num_dihedrals,), np.int32)
    smask = z((spec.num_dihedrals,), bool)
    lsm = z((spec.num_dihedrals,), np.int32)
    ax = z((spec.num_alpha,), np.int32)
    ay = z((spec.num_alpha,), np.int32)
    am = z((spec.num_alpha,), bool)
    y = z((B,))
    gm = z((B,), bool)

    n_off = e_off = d_off = a_off = s_off = al_off = 0
    for bi, g in enumerate(graphs):
        n = g.num_nodes
        x[n_off : n_off + n] = g.x
        node_mask[n_off : n_off + n] = True
        gid[n_off : n_off + n] = bi
        ne = g.edge_index.shape[1]
        esrc[e_off : e_off + ne] = g.edge_index[0] + n_off
        edst[e_off : e_off + ne] = g.edge_index[1] + n_off
        eattr[e_off : e_off + ne] = g.edge_attr
        emask[e_off : e_off + ne] = True
        nd = g.distances.shape[0]
        dists[d_off : d_off + nd] = g.distances
        di[d_off : d_off + nd] = g.distance_index[:, 0] + n_off
        dj[d_off : d_off + nd] = g.distance_index[:, 1] + n_off
        dmask[d_off : d_off + nd] = True
        na = g.angles.shape[0]
        angs[a_off : a_off + na] = g.angles
        ai[a_off : a_off + na] = g.angle_index[:, 0] + n_off
        aj[a_off : a_off + na] = g.angle_index[:, 1] + n_off
        ak[a_off : a_off + na] = g.angle_index[:, 2] + n_off
        amask[a_off : a_off + na] = True
        ns = g.dihedrals.shape[0]
        dihs[s_off : s_off + ns] = g.dihedrals
        si[s_off : s_off + ns] = g.dihedral_index[:, 0] + n_off
        sj[s_off : s_off + ns] = g.dihedral_index[:, 1] + n_off
        sk[s_off : s_off + ns] = g.dihedral_index[:, 2] + n_off
        sl[s_off : s_off + ns] = g.dihedral_index[:, 3] + n_off
        smask[s_off : s_off + ns] = True
        lsm[s_off : s_off + ns] = g.ls_map + al_off
        nal = g.alpha_index.shape[1]
        ax[al_off : al_off + nal] = g.alpha_index[0] + n_off
        ay[al_off : al_off + nal] = g.alpha_index[1] + n_off
        am[al_off : al_off + nal] = True
        y[bi] = g.y
        gm[bi] = True
        n_off += n
        e_off += ne
        d_off += nd
        a_off += na
        s_off += ns
        al_off += nal
        if (
            n_off > spec.num_nodes
            or e_off > spec.num_edges
            or d_off > spec.num_dist
            or a_off > spec.num_angles
            or s_off > spec.num_dihedrals
            or al_off > spec.num_alpha
        ):
            raise ValueError("chiro batch exceeds capacity")
    return ChiroBatch(
        x=x, node_mask=node_mask, node_graph_id=gid,
        edge_src=esrc, edge_dst=edst, edge_attr=eattr, edge_mask=emask,
        distances=dists, dist_i=di, dist_j=dj, dist_mask=dmask,
        angles=angs, ang_i=ai, ang_j=aj, ang_k=ak, ang_mask=amask,
        dihedrals=dihs, dih_i=si, dih_j=sj, dih_k=sk, dih_l=sl,
        dih_mask=smask, ls_map=lsm, alpha_x=ax, alpha_y=ay, alpha_mask=am,
        y=y, graph_mask=gm,
    )
