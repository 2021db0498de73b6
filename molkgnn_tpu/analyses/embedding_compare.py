"""Interpretability-as-validation: enantiomer embedding comparison.

Reference contract: analyses/atom_encoder/graph_embedding/
graph_embedding_compare.py (C21) — cosine-compare the graph embeddings of
stereoisomer SMILES pairs; a chirality-aware model must separate mirror
molecules (cosine < 1) while achiral duplicates stay identical. The
reference uses this as the de-facto check that the chirality machinery
works (SURVEY §4).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    denom = max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
    return float(np.dot(a, b) / denom)


def compare_embeddings(
    embeddings: np.ndarray, labels: Sequence[str]
) -> Dict[str, float]:
    """Pairwise cosine table over labeled embeddings ({"A-B": cos, ...})."""
    out = {}
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            out[f"{labels[i]}-{labels[j]}"] = cosine(
                embeddings[i], embeddings[j]
            )
    return out


def enantiomer_separation(
    model_apply, variables, batch_for, mirror_pairs
) -> Dict[str, float]:
    """Compute embedding cosine for (molecule, mirrored molecule) pairs.

    ``batch_for(graph)`` must build a single-molecule batch; mirroring is
    coordinate negation (a proper enantiomer for tetrahedral centers).
    """
    import dataclasses

    out = {}
    for name, g in mirror_pairs:
        b = batch_for(g)
        bm = dataclasses.replace(b, p=-b.p)
        e = np.asarray(model_apply(variables, b))
        em = np.asarray(model_apply(variables, bm))
        out[name] = cosine(e[0], em[0])
    return out
