"""Synthetic molecule-like graphs for tests and benchmarks.

Generates random connected graphs with max degree 4 (molecular topology),
random 3D coordinates, and feature tensors with the reference's shapes
(28-dim nodes / 7-dim bonds, wrapper.py:45-150). Feature *values* are random:
these graphs exercise shapes, masking, permutation alignment, and chirality
logic, not chemistry. Edge lists emit both bond directions consecutively
(2i, 2i+1), matching the reference layout (wrapper.py:152-156).
"""

from __future__ import annotations

from typing import List

import numpy as np

from molkgnn_tpu.graphs.molgraph import MolGraph


def random_molgraph(
    rng: np.random.Generator,
    num_atoms: int | None = None,
    node_dim: int = 28,
    edge_dim: int = 7,
    label: float | None = None,
    extra_edge_prob: float = 0.3,
) -> MolGraph:
    n = int(num_atoms if num_atoms is not None else rng.integers(8, 40))
    deg = np.zeros(n, np.int64)
    bonds = []

    # Random spanning tree with degree cap 4.
    order = rng.permutation(n)
    in_tree = [order[0]]
    for v in order[1:]:
        candidates = [u for u in in_tree if deg[u] < 4]
        u = candidates[int(rng.integers(len(candidates)))]
        bonds.append((u, v))
        deg[u] += 1
        deg[v] += 1
        in_tree.append(v)

    # A few ring-closing edges.
    n_extra = int(rng.binomial(max(n // 6, 1), extra_edge_prob))
    existing = set(map(frozenset, bonds))
    for _ in range(n_extra):
        u, v = rng.integers(0, n, size=2)
        if u == v or deg[u] >= 4 or deg[v] >= 4:
            continue
        if frozenset((int(u), int(v))) in existing:
            continue
        bonds.append((int(u), int(v)))
        existing.add(frozenset((int(u), int(v))))
        deg[u] += 1
        deg[v] += 1

    edge_list = []
    edge_attr = []
    for u, v in bonds:
        attr = np.zeros(edge_dim, np.float32)
        attr[int(rng.integers(0, 4))] = 1.0  # bond-order one-hot
        attr[4:] = rng.integers(0, 2, size=edge_dim - 4)
        edge_list.append((u, v))
        edge_attr.append(attr)
        edge_list.append((v, u))
        edge_attr.append(attr)

    x = rng.standard_normal((n, node_dim)).astype(np.float32)
    p = rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    y = float(label if label is not None else rng.integers(0, 2))
    g = MolGraph(
        x=x,
        p=p,
        edge_index=np.array(edge_list, np.int32).T,
        edge_attr=np.array(edge_attr, np.float32),
        y=y,
        atomic_num=rng.integers(1, 10, size=n).astype(np.int32),
    )
    return g.with_fields()


def random_dataset(
    seed: int = 0,
    num_graphs: int = 64,
    active_fraction: float = 0.1,
    **kwargs,
) -> List[MolGraph]:
    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(num_graphs):
        label = 1.0 if rng.random() < active_fraction else 0.0
        g = random_molgraph(rng, label=label, **kwargs)
        g.idx = i
        graphs.append(g)
    return graphs
