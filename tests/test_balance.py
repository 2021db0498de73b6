"""Balanced batch composition + tight sampler-aware specs
(molkgnn_tpu/graphs/balance.py).

The cover spec (spec_for_graphs) guarantees any subset fits but random
batches occupy only ~55% of it; dealing the epoch's ids by size lets a
~90%-occupancy spec run the identical math. These tests pin:

  * deal_by_size: multiset preservation, padding, position inverse.
  * spec_for_sampler: tighter than the cover spec, yet every dealt epoch
    fits (fresh seeds, oversampled draws included).
  * check_batches_fit: raises on overflow (gather_batch would silently
    truncate — the check is the only guard).
  * Trainer integration: balanced fit() trains and evaluates, balanced
    eval predictions equal the unbalanced device-path predictions in the
    caller's order, and seeded runs are deterministic.
"""

import tempfile

import numpy as np
import pytest

from molkgnn_tpu.data.dataset import make_synthetic_dataset
from molkgnn_tpu.graphs import spec_for_dataset, spec_for_graphs
from molkgnn_tpu.graphs.balance import (
    SIZE_FIELD,
    batch_field_sums,
    caps_vector,
    check_batches_fit,
    count_matrix,
    deal_by_size,
    spec_for_sampler,
)


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(seed=0, num_graphs=256)


@pytest.fixture(scope="module")
def counts(ds):
    return count_matrix(ds.graphs)


def test_deal_by_size_preserves_multiset_and_positions(counts):
    rng = np.random.default_rng(3)
    ids = rng.choice(200, size=101, replace=True)
    sizes = counts[ids, SIZE_FIELD]
    idm, posm = deal_by_size(ids, sizes, batch_size=16)
    assert idm.shape == posm.shape == (7, 16)
    valid = idm >= 0
    assert valid.sum() == 101
    assert (valid == (posm >= 0)).all()
    # multiset of dealt ids == input multiset
    assert sorted(idm[valid].tolist()) == sorted(ids.tolist())
    # position matrix is an exact inverse: idm[i,j] == ids[posm[i,j]]
    np.testing.assert_array_equal(idm[valid], ids[posm[valid]])
    # dealt batches are near-equal in the dealt field: max/min sum ratio
    sums = batch_field_sums(idm, counts)[:, SIZE_FIELD]
    assert sums.max() <= sums.min() * 1.5


def test_spec_for_sampler_tight_and_sufficient(ds, counts):
    bs = 32
    cover = spec_for_graphs(ds.graphs, batch_size=bs)
    tight = spec_for_dataset(ds, bs, seed=0)
    assert (caps_vector(tight) < caps_vector(cover)).all()

    # Fresh-seed epochs (not those simulated at spec build): permutations
    # and oversampled draws all fit after dealing.
    from molkgnn_tpu.data.dataset import oversampling_weights

    train = np.asarray(ds.split["train"])
    labels = np.array([ds.graphs[i].y for i in train])
    w = oversampling_weights(labels)
    rng = np.random.default_rng(999)
    for _ in range(20):
        sampled = train[
            rng.choice(len(train), size=len(train), p=w / w.sum())
        ]
        idm, _ = deal_by_size(sampled, counts[sampled, SIZE_FIELD], bs)
        check_batches_fit(idm, counts, tight)
    for part in ("train", "valid", "test"):
        ids = np.asarray(ds.split[part])
        idm, _ = deal_by_size(ids, counts[ids, SIZE_FIELD], bs)
        check_batches_fit(idm, counts, tight)


def test_check_batches_fit_raises_with_field_name(ds, counts):
    bs = 32
    tight = spec_for_dataset(ds, bs, seed=0)
    too_tight = spec_for_graphs(ds.graphs, batch_size=4)  # 4-graph caps
    ids = np.asarray(ds.split["train"])[: bs]
    idm, _ = deal_by_size(ids, counts[ids, SIZE_FIELD], bs)
    check_batches_fit(idm, counts, tight)
    with pytest.raises(ValueError, match="capacity"):
        check_batches_fit(idm, counts, too_tight)


def test_trainer_balanced_batches_end_to_end(ds):
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    def make(balanced, spec, seed=7):
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=2,
                kernels_1hop=(4, 4, 4, 4),
                kernels_nhop=(4, 4, 4, 4),
                graph_embedding_dim=16,
            ),
        )
        cfg = TrainConfig(
            batch_size=32,
            max_epochs=2,
            warmup_iterations=10,
            progress=False,
            seed=seed,
            balanced_batches=balanced,
            scan_steps=2, log_dir=tempfile.mkdtemp(prefix="mkt_"),)
        return Trainer(model, ds, spec, cfg)

    tight = spec_for_dataset(ds, 32, seed=0)
    tr = make(True, tight)
    hist = tr.fit()
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])

    # Balanced eval returns predictions in the CALLER's id order: compare
    # against the unbalanced device path with identical params on the
    # cover spec (only padding differs; masked ops make them equal).
    cover = spec_for_graphs(ds.graphs, batch_size=32)
    ref = make(False, cover, seed=7)
    ref.state = ref.state.replace(
        params=tr.state.params, batch_stats=tr.state.batch_stats
    )
    ids = np.asarray(ds.split["valid"])
    true_b, pred_b = tr._predict_ids(ids)
    true_u, pred_u = ref._predict_ids(ids)
    np.testing.assert_array_equal(true_b, true_u)
    np.testing.assert_allclose(pred_b, pred_u, rtol=2e-4, atol=2e-5)


def test_trainer_balanced_is_deterministic(ds):
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    tight = spec_for_dataset(ds, 32, seed=0)

    def run():
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=1,
                kernels_1hop=(3, 3, 3, 3),
                kernels_nhop=(3, 3, 3, 3),
                graph_embedding_dim=8,
            ),
        )
        cfg = TrainConfig(
            batch_size=32,
            max_epochs=1,
            warmup_iterations=10,
            progress=False,
            balanced_batches=True, log_dir=tempfile.mkdtemp(prefix="mkt_"),)
        tr = Trainer(model, ds, tight, cfg)
        return tr.fit()[-1]

    a, b = run(), run()
    assert a["loss"] == b["loss"]
    assert a["AUC"] == b["AUC"]


def test_balanced_requires_device_data(ds):
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    tight = spec_for_dataset(ds, 32, seed=0)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1,
            kernels_1hop=(3, 3, 3, 3),
            kernels_nhop=(3, 3, 3, 3),
            graph_embedding_dim=8,
        ),
    )
    cfg = TrainConfig(
        batch_size=32, progress=False, balanced_batches=True,
        use_device_data=False, log_dir=tempfile.mkdtemp(prefix="mkt_"),)
    with pytest.raises(ValueError, match="device-data"):
        Trainer(model, ds, tight, cfg)
