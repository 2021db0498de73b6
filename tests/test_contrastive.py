"""Contrastive losses + stereoisomer samplers (C22) tests."""

import jax.numpy as jnp
import numpy as np
import torch

from molkgnn_tpu.training.contrastive import (
    SampleMapToNegatives,
    SampleMapToPositives,
    StereoBatchSampler,
    make_triplets,
    ranking_loss,
    triplet_loss,
)


def test_triplet_loss_matches_torch():
    rng = np.random.default_rng(0)
    a, p, n = (rng.standard_normal((6, 8)).astype(np.float32) for _ in range(3))
    for metric, dist_fn in (
        ("euclidean", torch.nn.PairwiseDistance(p=2.0)),
        ("manhattan", torch.nn.PairwiseDistance(p=1.0)),
        (
            "cosine",
            lambda x, y: 1.0 - torch.nn.functional.cosine_similarity(x, y),
        ),
    ):
        want = torch.nn.TripletMarginWithDistanceLoss(
            distance_function=dist_fn, margin=1.0
        )(torch.tensor(a), torch.tensor(p), torch.tensor(n)).item()
        got = float(
            triplet_loss(
                jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                distance_metric=metric,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_triplet_loss_normalized_variant():
    rng = np.random.default_rng(1)
    a, p, n = (rng.standard_normal((4, 8)).astype(np.float32) * 5 for _ in range(3))
    v = float(
        triplet_loss(
            jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
            distance_metric="euclidean_normalized",
        )
    )
    assert 0 <= v <= 3.01  # normalized embeddings bound the distances


def test_ranking_loss_sign():
    pi = jnp.asarray([2.0, 0.0])
    pj = jnp.asarray([0.0, 2.0])
    ti = jnp.asarray([1.0, 0.0])
    tj = jnp.asarray([0.0, 1.0])
    # Correct ordering with gap 2 > margin => zero loss.
    assert float(ranking_loss(pi, pj, ti, tj, margin=0.3)) == 0.0
    # Reversed predictions => positive loss.
    assert float(ranking_loss(pj, pi, ti, tj, margin=0.3)) > 0.0


SMILES = ["C[C@H](N)O", "C[C@@H](N)O", "C[C@H](N)O", "CCO", "CCO"]
NOSTEREO = ["CC(N)O", "CC(N)O", "CC(N)O", "CCO", "CCO"]


def test_positive_negative_maps():
    pos = SampleMapToPositives(SMILES)
    neg = SampleMapToNegatives(SMILES, NOSTEREO)
    # Records 0 and 2 are the same isomer -> positives of each other.
    assert pos.positives[0] == [2]
    # Negative of record 0 is the opposite enantiomer (record 1) only.
    assert neg.negatives[0] == [1]
    # Achiral CCO records have positives (each other) but no negatives.
    assert pos.positives[3] == [4]
    assert neg.negatives[3] == []


def test_stereo_batch_sampler_keeps_groups_whole():
    sampler = StereoBatchSampler(NOSTEREO, batch_size=3, seed=0)
    batches = list(sampler)
    assert sum(len(b) for b in batches) == len(NOSTEREO)
    for b in batches:
        # No stereo group is split across batches.
        for key in set(NOSTEREO):
            members = [i for i in b if NOSTEREO[i] == key]
            if members:
                full_group = [i for i in range(len(NOSTEREO)) if NOSTEREO[i] == key]
                assert members == full_group


def test_make_triplets_semantics():
    rng_trips = make_triplets(SMILES, NOSTEREO, num=20, seed=1)
    assert rng_trips.shape == (20, 3)
    for a, p, n in rng_trips:
        assert SMILES[a] == SMILES[p]  # positive: same isomer
        assert NOSTEREO[a] == NOSTEREO[n] and SMILES[a] != SMILES[n]
