"""Contrastive / triplet training utilities (ChIRo standalone harness).

Reference contract: models/ChIRoNet/optimization_functions.py:15-45 (triplet
margin loss with four distance metrics) and datasets_samplers.py (C22):
Siamese positive/negative samplers over stereoisomer groups and the
stereoisomer-grouped batch sampler. The reference's standalone epoch loops
(classification / contrastive / binary-ranking-regression,
gnn_3D/train_functions.py) map onto the Trainer with these losses plus the
samplers below.

Stereoisomer grouping keys on a stereo-stripped SMILES (``smiles_nostereo``)
— molecules sharing it are stereoisomers of each other: positives for the
anchor are *other conformers/records of the same isomer*, negatives are
*different stereoisomers of the same skeleton*.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------
def _distance(a: jnp.ndarray, b: jnp.ndarray, metric: str) -> jnp.ndarray:
    if metric in ("euclidean", "euclidean_normalized"):
        return jnp.linalg.norm(a - b + 1e-6, axis=-1)
    if metric == "manhattan":
        return jnp.sum(jnp.abs(a - b), axis=-1)
    if metric == "cosine":
        num = jnp.sum(a * b, axis=-1)
        den = jnp.maximum(
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-8
        )
        return 1.0 - num / den
    raise ValueError(f"distance metric {metric} is not implemented")


def triplet_loss(
    z_anchor: jnp.ndarray,
    z_positive: jnp.ndarray,
    z_negative: jnp.ndarray,
    margin: float = 1.0,
    reduction: str = "mean",
    distance_metric: str = "euclidean",
) -> jnp.ndarray:
    """max(d(a,p) - d(a,n) + margin, 0) with the reference's metric set.

    ``euclidean_normalized`` L2-normalizes all three embeddings first
    (optimization_functions.py:39-43); note torch's PairwiseDistance adds
    its eps inside the difference — replicated in ``_distance``.
    """
    if distance_metric == "euclidean_normalized":
        norm = lambda z: z / jnp.linalg.norm(z + 1e-10, axis=1, keepdims=True)
        z_anchor, z_positive, z_negative = (
            norm(z_anchor), norm(z_positive), norm(z_negative),
        )
    d_pos = _distance(z_anchor, z_positive, distance_metric)
    d_neg = _distance(z_anchor, z_negative, distance_metric)
    per = jnp.maximum(d_pos - d_neg + margin, 0.0)
    if reduction == "mean":
        return jnp.mean(per)
    if reduction == "sum":
        return jnp.sum(per)
    return per


def mse_loss(y: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(y - y_hat))


def ranking_loss(
    pred_i: jnp.ndarray,
    pred_j: jnp.ndarray,
    target_i: jnp.ndarray,
    target_j: jnp.ndarray,
    margin: float = 0.3,
) -> jnp.ndarray:
    """Margin ranking over stereoisomer pairs (the binary-ranking-regression
    objective of gnn_3D/train_functions.py): the prediction gap must agree
    in sign with the target gap by at least ``margin``."""
    sign = jnp.sign(target_i - target_j)
    return jnp.mean(jnp.maximum(-sign * (pred_i - pred_j) + margin, 0.0))


# ---------------------------------------------------------------------------
# Samplers (host-side)
# ---------------------------------------------------------------------------
class SampleMapToPositives:
    """index -> other records of the SAME stereoisomer (same full smiles);
    reference Sample_Map_To_Positives (datasets_samplers.py:167-190)."""

    def __init__(self, smiles: Sequence[str], include_anchor: bool = False):
        groups: Dict[str, List[int]] = defaultdict(list)
        for i, s in enumerate(smiles):
            groups[s].append(i)
        self.positives = {
            i: [j for j in groups[s] if include_anchor or j != i]
            for i, s in enumerate(smiles)
        }

    def sample(self, i: int, rng: np.random.Generator, n: int = 1) -> List[int]:
        pool = self.positives[i]
        if not pool:
            return [i] * n
        return list(rng.choice(pool, size=n, replace=len(pool) < n))


class SampleMapToNegatives:
    """index -> records of DIFFERENT stereoisomers sharing the stereo-
    stripped smiles; reference Sample_Map_To_Negatives."""

    def __init__(self, smiles: Sequence[str], smiles_nostereo: Sequence[str]):
        skeleton: Dict[str, List[int]] = defaultdict(list)
        for i, s in enumerate(smiles_nostereo):
            skeleton[s].append(i)
        self.negatives = {
            i: [
                j
                for j in skeleton[smiles_nostereo[i]]
                if smiles[j] != smiles[i]
            ]
            for i in range(len(smiles))
        }

    def sample(self, i: int, rng: np.random.Generator, n: int = 1) -> List[int]:
        pool = self.negatives[i]
        if not pool:
            return [i] * n
        return list(rng.choice(pool, size=n, replace=len(pool) < n))


class StereoBatchSampler:
    """Batches of whole stereoisomer groups (datasets_samplers.py:23-54):
    groups (by stereo-stripped smiles) are shuffled, then packed whole into
    batches of at most ``batch_size`` records."""

    def __init__(
        self,
        smiles_nostereo: Sequence[str],
        batch_size: int,
        seed: int = 0,
    ):
        groups: Dict[str, List[int]] = defaultdict(list)
        for i, s in enumerate(smiles_nostereo):
            groups[s].append(i)
        self.groups = list(groups.values())
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        order = self.rng.permutation(len(self.groups))
        batch: List[int] = []
        for gi in order:
            group = self.groups[gi]
            if batch and len(batch) + len(group) > self.batch_size:
                yield batch
                batch = []
            batch.extend(group)
        if batch:
            yield batch

    def __len__(self):
        total = sum(len(g) for g in self.groups)
        return -(-total // self.batch_size)


def make_triplets(
    smiles: Sequence[str],
    smiles_nostereo: Sequence[str],
    num: int,
    seed: int = 0,
):
    """(anchor, positive, negative) index triples for contrastive training
    (the Siamese sampler composition the reference loops use)."""
    rng = np.random.default_rng(seed)
    pos_map = SampleMapToPositives(smiles, include_anchor=True)
    neg_map = SampleMapToNegatives(smiles, smiles_nostereo)
    anchors = [i for i in range(len(smiles)) if neg_map.negatives[i]]
    if not anchors:
        return np.zeros((0, 3), np.int64)
    out = []
    for _ in range(num):
        a = int(rng.choice(anchors))
        p = pos_map.sample(a, rng)[0]
        n = neg_map.sample(a, rng)[0]
        out.append((a, p, n))
    return np.array(out, np.int64)
