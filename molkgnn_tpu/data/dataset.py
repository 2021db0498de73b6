"""Datasets, splits, and host-side loaders.

Mirrors the reference's data layer contract (/root/reference/data.py,
wrapper.py:246-556): a dataset registry that attaches per-dataset metrics and
loss, stratified splits, and a train loader with optional
oversampling-with-replacement (WeightedRandomSampler semantics, inverse
class-count weights, data.py:144-166).

The QSAR SDF ingest lives in chem/; this module works with any list of
``MolGraph``. Processed datasets cache to one ``.npz`` per (dataset, feature
version) — the TPU-side analogue of the reference's processed ``.pt`` files
(wrapper.py:391-392).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from molkgnn_tpu.graphs.batch import BatchSpec, GraphBatch, batch_graphs
from molkgnn_tpu.graphs.molgraph import MolGraph

QSAR_DATASET_NAMES = (
    "435008",
    "1798",
    "435034",
    "1843",
    "2258",
    "463087",
    "488997",
    "2689",
    "485290",
    "9999",
)
D4DCHP_DATASET_NAMES = ("CHIRAL1", "DIFF5", "D4DCHP", "dummy")

QSAR_METRICS = ["ppv", "logAUC_0.001_0.1", "logAUC_0.001_1", "f1_score", "AUC"]


@dataclasses.dataclass
class Dataset:
    """A featurized dataset with split indices and evaluation contract."""

    name: str
    graphs: List[MolGraph]
    split: Dict[str, np.ndarray]  # train/valid/test -> indices
    metrics: List[str]
    loss_name: str  # key into training.model.LOSSES

    def subset(self, part: str) -> List[MolGraph]:
        return [self.graphs[i] for i in self.split[part]]


def make_synthetic_dataset(
    seed: int = 0,
    num_graphs: int = 256,
    active_fraction: float = 0.15,
) -> Dataset:
    """Small random dataset with the QSAR evaluation contract, for tests,
    benchmarks, and smoke training (the analogue of the reference's AID 9999
    smoke dataset, SURVEY §4)."""
    from molkgnn_tpu.data.synthetic import random_dataset

    graphs = random_dataset(
        seed=seed, num_graphs=num_graphs, active_fraction=active_fraction
    )
    rng = np.random.default_rng(seed + 1)
    perm = rng.permutation(num_graphs)
    n_tr = int(num_graphs * 0.8)
    n_va = int(num_graphs * 0.1)
    split = {
        "train": np.sort(perm[:n_tr]),
        "valid": np.sort(perm[n_tr : n_tr + n_va]),
        "test": np.sort(perm[n_tr + n_va :]),
    }
    return Dataset(
        name="synthetic",
        graphs=graphs,
        split=split,
        metrics=list(QSAR_METRICS),
        loss_name="bce_with_logits",
    )


def make_motif_dataset(
    seed: int = 0,
    num_graphs: int = 256,
    noise: float = 0.3,
) -> Dataset:
    """Smoke dataset with a LEARNABLE label: positives carry a planted
    4-neighbor feature motif around a degree-4 center — the pattern class
    the kernel conv is built to match. Unlike ``make_synthetic_dataset``
    (random labels — eval metrics there are pure sampling noise), training
    curves on this set are meaningful evidence that the end-to-end loop
    learns; used by the CLI ``synthetic_motif`` smoke entry."""
    from molkgnn_tpu.data.synthetic import random_molgraph

    rng = np.random.default_rng(seed)
    motifs = rng.standard_normal((4, 28)).astype(np.float32) * 2
    graphs = []
    while len(graphs) < num_graphs:
        g = random_molgraph(rng, num_atoms=16)
        if g.fields[4].count < 1:
            continue
        y = float(rng.random() < 0.5)
        if y == 1.0:
            nei = g.fields[4].nei_index[0]
            for k in range(4):
                g.x[int(nei[k])] = motifs[k] + noise * rng.standard_normal(
                    28
                ).astype(np.float32)
            g.fields = None
            g = g.with_fields()
        g.y = y
        g.idx = len(graphs)
        graphs.append(g)
    perm = rng.permutation(num_graphs)
    n_tr = int(num_graphs * 0.8)
    n_va = int(num_graphs * 0.1)
    split = {
        "train": np.sort(perm[:n_tr]),
        "valid": np.sort(perm[n_tr : n_tr + n_va]),
        "test": np.sort(perm[n_tr + n_va :]),
    }
    return Dataset(
        name="synthetic_motif",
        graphs=graphs,
        split=split,
        metrics=list(QSAR_METRICS),
        loss_name="bce_with_logits",
    )


def oversampling_weights(labels: np.ndarray) -> np.ndarray:
    """Inverse-class-count weights (reference data.py:144-158)."""
    n_active = int((labels == 1).sum())
    n_inactive = int(labels.shape[0]) - n_active
    w = np.where(labels == 1, 1.0 / max(n_active, 1), 1.0 / max(n_inactive, 1))
    return w


class GraphLoader:
    """Host-side loader producing fixed-shape GraphBatches.

    ``oversample=True`` reproduces WeightedRandomSampler(replacement=True,
    num_samples=len(dataset)); otherwise optional shuffling. The final
    partial batch is padded with masked dummy graphs (never dropped).
    """

    def __init__(
        self,
        graphs: Sequence[MolGraph],
        spec: BatchSpec,
        batch_size: int,
        shuffle: bool = False,
        oversample: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        collate=None,
    ):
        self.graphs = list(graphs)
        self.spec = spec
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.oversample = oversample
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        # Default (kgnn) path uses the flat-packed fast assembler: the
        # dataset is pre-concatenated once, batches are O(1) numpy gathers
        # (graphs/packed.py). Custom collates (3D/chiro families) pack
        # per-molecule.
        self._packed = None
        if collate is None:
            from molkgnn_tpu.graphs.packed import PackedGraphs

            self._packed = PackedGraphs.from_graphs(self.graphs)
        self.collate = collate if collate is not None else batch_graphs

    def __len__(self) -> int:
        n = len(self.graphs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch_order(self) -> np.ndarray:
        n = len(self.graphs)
        if self.oversample:
            labels = np.array([g.y for g in self.graphs])
            w = oversampling_weights(labels)
            return self.rng.choice(n, size=n, replace=True, p=w / w.sum())
        if self.shuffle:
            return self.rng.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator[GraphBatch]:
        order = self.epoch_order()
        bs = self.batch_size
        limit = (len(order) // bs) * bs if self.drop_last else len(order)
        for start in range(0, limit, bs):
            idx = order[start : start + bs]
            if self._packed is not None:
                yield self._packed.pack(idx, self.spec)
            else:
                yield self.collate([self.graphs[i] for i in idx], self.spec)
