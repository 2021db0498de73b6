"""Training-harness tests: metrics, schedule, optimizer masks, smoke train."""

import numpy as np
import pytest

from molkgnn_tpu.data.dataset import (
    GraphLoader,
    make_synthetic_dataset,
    oversampling_weights,
)
from molkgnn_tpu.graphs import spec_for_graphs
from molkgnn_tpu.models import MolKGNNNet
from molkgnn_tpu.training import (
    GNNModel,
    TrainConfig,
    Trainer,
    calculate_auc,
    calculate_logAUC,
    polynomial_warmup_decay,
)
from molkgnn_tpu.training.optim import decay_mask


def test_logauc_perfect_and_random():
    rng = np.random.default_rng(0)
    n = 20000
    y = (rng.random(n) < 0.05).astype(int)
    perfect = y.astype(float) + rng.random(n) * 1e-6
    assert calculate_logAUC(y, perfect) > 0.99
    random_score = rng.random(n)
    la = calculate_logAUC(y, random_score)
    assert 0.005 < la < 0.06  # ~0.0215 for a random classifier
    assert abs(calculate_auc(y, random_score) - 0.5) < 0.03


def test_logauc_range_validation():
    y = np.array([0, 1, 0, 1])
    s = np.array([0.1, 0.9, 0.2, 0.8])
    with pytest.raises(ValueError):
        calculate_logAUC(y, s, FPR_range=(0.1, 0.1))
    with pytest.raises(ValueError):
        calculate_logAUC(y, s, FPR_range=None)


def test_polynomial_schedule_matches_torch_semantics():
    """Oracle: the reference's get_lr formula (lr.py:17-31), 1-indexed."""
    peak, end, warm, tot, power = 5e-3, 1e-10, 10, 100, 1.0

    def torch_lr(step_count):
        if step_count <= warm:
            return step_count / warm * peak
        if step_count >= tot:
            return end
        pct = 1 - (step_count - warm) / (tot - warm)
        return (peak - end) * pct**power + end

    sched = polynomial_warmup_decay(peak, end, warm, tot, power)
    for count in [0, 1, 5, 9, 10, 50, 98, 99, 150]:
        np.testing.assert_allclose(
            float(sched(count)), torch_lr(count + 1), rtol=1e-5
        )


def test_decay_mask_partitions_kernel_params():
    import jax

    ds = make_synthetic_dataset(num_graphs=8)
    spec = spec_for_graphs(ds.graphs, batch_size=4)
    from molkgnn_tpu.data.dataset import GraphLoader

    batch = next(iter(GraphLoader(ds.graphs[:4], spec, 4)))
    model = GNNModel(encoder=MolKGNNNet(num_layers=2))
    variables = model.init(jax.random.key(0), batch)
    mask = decay_mask(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, decays in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        if any(
            k in name
            for k in ("x_center", "x_support", "p_support")
        ):
            assert not decays, name
        elif "edge_attr_support_sc_weight" in name:
            assert decays, name
        elif "edge_attr_support" in name:
            assert not decays, name
        elif "ffn" in name or "lin" in name or "batch_norm" in name:
            assert decays, name


def test_oversampling_weights_inverse_class_count():
    labels = np.array([1, 0, 0, 0, 0, 1])
    w = oversampling_weights(labels)
    np.testing.assert_allclose(w[labels == 1], 1 / 2)
    np.testing.assert_allclose(w[labels == 0], 1 / 4)


def test_loader_oversampling_balances_classes():
    ds = make_synthetic_dataset(seed=4, num_graphs=200, active_fraction=0.1)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    loader = GraphLoader(
        ds.subset("train"), spec, 8, oversample=True, seed=0
    )
    ys = []
    for batch in loader:
        ys.append(np.asarray(batch.y)[np.asarray(batch.graph_mask)])
    frac = np.concatenate(ys).mean()
    assert 0.3 < frac < 0.7  # balanced-ish vs the 0.1 base rate


def test_smoke_training_loss_decreases(tmp_path):
    ds = make_synthetic_dataset(seed=1, num_graphs=48, active_fraction=0.3)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=2,
            kernels_1hop=(3, 4, 5, 6),
            kernels_nhop=(3, 4, 5, 6),
            graph_embedding_dim=16,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=8,
        max_epochs=4,
        peak_lr=5e-3,
        warmup_iterations=5,
        weight_decay=1e-3,
        oversample=True,
        log_dir=str(tmp_path / "logs"),
        progress=False,
    )
    trainer = Trainer(model, ds, spec, cfg)
    history = trainer.fit()
    assert len(history) == 4
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert np.isfinite(history[-1]["loss"])
    # Test procedure writes result + per-sample score logs for each ckpt.
    results = trainer.test()
    assert "last" in results
    assert (tmp_path / "logs" / "test_result.log").exists()
    assert any(
        p.name.startswith("test_sample_scores")
        for p in (tmp_path / "logs").iterdir()
    )


def test_scan_steps_match_single_steps(tmp_path):
    """scan_steps=K fuses K optimizer steps into one dispatch; the math
    (sampling order, dropout fold-in, AdamW, schedule) must be identical to
    step-by-step execution, including the non-divisible remainder steps."""
    import jax

    def run(scan_steps, tag):
        ds = make_synthetic_dataset(seed=9, num_graphs=40, active_fraction=0.3)
        spec = spec_for_graphs(ds.graphs, batch_size=8)
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=1, kernels_1hop=(2, 3, 2, 3),
                kernels_nhop=(2, 3, 2, 3), graph_embedding_dim=8,
            ),
            ffn_dropout_rate=0.2,
        )
        cfg = TrainConfig(
            batch_size=8, max_epochs=2, warmup_iterations=3,
            oversample=True, progress=False, scan_steps=scan_steps,
            log_dir=str(tmp_path / tag),
        )
        trainer = Trainer(model, ds, spec, cfg)
        trainer.fit()
        return trainer

    single = run(1, "single")
    # train split is 32 graphs -> 4 steps/epoch; K=3 exercises the
    # scan block AND the remainder single-step path.
    fused = run(3, "fused")
    assert int(fused.state.step) == int(single.state.step)
    for a, b in zip(
        jax.tree.leaves(single.state.params),
        jax.tree.leaves(fused.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_scan_chunk_matches_flat_scan(tmp_path):
    """scan_chunk=C factors the K-step fused dispatch into (K//C x C)
    nested scans. The step SEQUENCE is identical to the flat scan (same
    per-step RNG fold-ins, same sampler draws, same updates), so trained
    params must match — this is what lets the b8192 saturation bench row
    keep the headline's 80-step window under the relay compiler's
    (batch x flat-scan-length) capacity limit
    (benchmarks/B8192_BISECT.json)."""
    import jax

    def run(scan_chunk, device_sampling, tag):
        ds = make_synthetic_dataset(seed=9, num_graphs=40, active_fraction=0.3)
        spec = spec_for_graphs(ds.graphs, batch_size=8)
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=1, kernels_1hop=(2, 3, 2, 3),
                kernels_nhop=(2, 3, 2, 3), graph_embedding_dim=8,
            ),
            ffn_dropout_rate=0.2,
        )
        cfg = TrainConfig(
            batch_size=8, max_epochs=2, warmup_iterations=3,
            oversample=True, progress=False, scan_steps=4,
            scan_chunk=scan_chunk, device_sampling=device_sampling,
            log_dir=str(tmp_path / tag),
        )
        trainer = Trainer(model, ds, spec, cfg)
        trainer.fit()
        return trainer

    for devsample in (False, True):
        flat = run(0, devsample, f"flat{devsample}")
        nested = run(2, devsample, f"nested{devsample}")
        assert int(nested.state.step) == int(flat.state.step)
        for a, b in zip(
            jax.tree.leaves(flat.state.params),
            jax.tree.leaves(nested.state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
            )


def test_device_sample_ids_distribution_and_range():
    """sample_ids must reproduce WeightedRandomSampler(replacement=True)
    semantics (reference data.py:144-166): i.i.d. draws with probability
    proportional to inverse class counts — so a heavily imbalanced pool
    samples ~50/50 active/inactive — and every id must come from the train
    id set."""
    import jax
    import jax.numpy as jnp

    from molkgnn_tpu.graphs.device_pack import alias_sampler, sample_ids

    labels = np.zeros(200)
    labels[:20] = 1.0  # 10% actives
    train_ids = np.arange(100, 300, dtype=np.int32)  # global ids offset
    table = jax.tree.map(
        jnp.asarray, alias_sampler(oversampling_weights(labels))
    )
    tids = jnp.asarray(train_ids)
    draws = []
    for i in range(40):
        ids = np.asarray(
            jax.jit(sample_ids, static_argnums=3)(
                jax.random.fold_in(jax.random.key(7), i), table, tids, 256
            )
        )
        draws.append(ids)
    ids = np.concatenate(draws)
    assert ids.min() >= 100 and ids.max() < 300
    active_frac = (ids < 120).mean()  # global ids 100..119 are the actives
    assert abs(active_frac - 0.5) < 0.02  # 10240 draws; 3 sigma ~ 0.015
    # Determinism: same key -> same ids.
    a = sample_ids(jax.random.key(3), table, tids, 64)
    b = sample_ids(jax.random.key(3), table, tids, 64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_alias_sampler_exact_and_large_n():
    """The alias table encodes the normalized weights EXACTLY (per-bucket
    expected mass = (1 + sum of incoming alias residuals) / n), with no
    large-n degradation — the failure mode of a float32 inverse-cdf, where
    positions near 1.0 collapse to zero probability once n ~ 1/eps(f32)
    (ADVICE r3)."""
    from molkgnn_tpu.graphs.device_pack import alias_sampler

    rng = np.random.default_rng(0)
    w = rng.random(997) + 1e-3
    t = alias_sampler(w)
    # Reconstruct each bucket's total mass from the table in f64.
    mass = np.asarray(t.prob, np.float64).copy()
    np.add.at(mass, t.alias, 1.0 - np.asarray(t.prob, np.float64))
    np.testing.assert_allclose(
        mass / mass.sum(), w / w.sum(), rtol=1e-6, atol=1e-9
    )
    # Large n: every bucket keeps nonzero mass (uniform weights, n >> the
    # f32-cdf collapse threshold regime scaled down is meaningless — use
    # 2e6 directly; builds in ~1 s).
    n = 2_000_000
    t = alias_sampler(np.ones(n))
    assert np.asarray(t.prob).min() > 0.99  # uniform => all ~1.0 exactly
    w2 = np.ones(n)
    w2[: n // 2] = 1e-3
    t2 = alias_sampler(w2)
    mass2 = np.asarray(t2.prob, np.float64).copy()
    np.add.at(mass2, t2.alias, 1.0 - np.asarray(t2.prob, np.float64))
    frac_small = mass2[: n // 2].sum() / mass2.sum()
    expect = (n // 2 * 1e-3) / (n // 2 * 1e-3 + n // 2)
    np.testing.assert_allclose(frac_small, expect, rtol=1e-5)


def test_device_sampling_fit_runs_and_steps_exactly(tmp_path):
    """device_sampling epochs run with ZERO per-step host input but keep
    the host sampler's epoch budget (ceil(n_train/B) steps, incl. the
    remainder program), advance the step counter exactly, produce finite
    losses, and stay deterministic per seed."""
    import jax

    def run(tag):
        ds = make_synthetic_dataset(seed=9, num_graphs=40, active_fraction=0.3)
        spec = spec_for_graphs(ds.graphs, batch_size=8)
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=1, kernels_1hop=(2, 3, 2, 3),
                kernels_nhop=(2, 3, 2, 3), graph_embedding_dim=8,
            ),
            ffn_dropout_rate=0.2,
        )
        cfg = TrainConfig(
            batch_size=8, max_epochs=2, warmup_iterations=3,
            oversample=True, progress=False, scan_steps=3,
            device_sampling=True, log_dir=str(tmp_path / tag),
        )
        trainer = Trainer(model, ds, spec, cfg)
        history = trainer.fit()
        return trainer, history

    t1, h1 = run("a")
    # train split 32 graphs -> 4 steps/epoch; K=3 forces one full block
    # plus a remainder-1 program per epoch.
    assert int(np.asarray(t1.state.step)) == 8
    assert sorted(t1._sample_programs) == [1, 3]
    assert all(np.isfinite(h["train_loss"]) for h in h1)
    t2, h2 = run("b")
    assert [h["train_loss"] for h in h1] == [h["train_loss"] for h in h2]


def test_device_sampling_validation():
    """device_sampling outside its supported envelope must fail loudly."""
    ds = make_synthetic_dataset(seed=9, num_graphs=24, active_fraction=0.3)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1, kernels_1hop=(2, 3, 2, 3),
            kernels_nhop=(2, 3, 2, 3), graph_embedding_dim=8,
        )
    )
    with pytest.raises(ValueError, match="oversampling"):
        Trainer(
            model, ds, spec,
            TrainConfig(
                batch_size=8, oversample=False, device_sampling=True,
                progress=False,
            ),
        )
    with pytest.raises(ValueError, match="balanced"):
        Trainer(
            model, ds, spec,
            TrainConfig(
                batch_size=8, oversample=True, device_sampling=True,
                balanced_batches=True, progress=False,
            ),
        )


def test_full_state_resume(tmp_path):
    """Training N epochs == training k, save/load full state, train N-k."""
    import jax

    def make(seed_dir):
        ds = make_synthetic_dataset(seed=8, num_graphs=32, active_fraction=0.3)
        spec = spec_for_graphs(ds.graphs, batch_size=8)
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=1, kernels_1hop=(2, 2, 2, 2),
                kernels_nhop=(2, 2, 2, 2), graph_embedding_dim=8,
            ),
            ffn_dropout_rate=0.0,
        )
        cfg = TrainConfig(
            batch_size=8, max_epochs=2, warmup_iterations=3,
            oversample=False, progress=False,
            log_dir=str(tmp_path / seed_dir),
        )
        return Trainer(model, ds, spec, cfg)

    straight = make("a")
    straight.config.max_epochs = 4
    straight.fit()

    resumed = make("b")
    resumed.fit()  # 2 epochs
    ckpt = str(tmp_path / "state")
    resumed.save_state(ckpt)

    fresh = make("c")
    fresh.load_state(ckpt)
    # The id-sampler RNG is part of host state; reseed deterministically the
    # same way a restarted process would (epoch count known from history).
    fresh._id_rng = resumed._id_rng
    fresh.fit()  # 2 more epochs

    for a, b in zip(
        jax.tree.leaves(straight.state.params),
        jax.tree.leaves(fresh.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        )


def test_skip_nonfinite_updates():
    """A batch that produces NaN loss must not poison the parameters."""
    import dataclasses

    import jax

    ds = make_synthetic_dataset(seed=12, num_graphs=16, active_fraction=0.5)
    spec = spec_for_graphs(ds.graphs, batch_size=4)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1, kernels_1hop=(2, 2, 2, 2), kernels_nhop=(2, 2, 2, 2),
            graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=4, max_epochs=1, warmup_iterations=2, oversample=False,
        progress=False, skip_nonfinite_updates=True, use_device_data=False,
    )
    trainer = Trainer(model, ds, spec, cfg)
    batch = next(iter(GraphLoader(ds.graphs[:4], spec, 4)))
    poisoned = dataclasses.replace(
        batch, x=np.full_like(np.asarray(batch.x), np.nan)
    )
    # Copy out before stepping: the train step donates the state buffers.
    before = [np.asarray(x).copy() for x in jax.tree.leaves(trainer.state.params)]
    state, loss = trainer._train_step(trainer.state, poisoned)
    after = jax.tree.leaves(state.params)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert int(state.step) == 1  # schedule still advances
    # A clean batch still updates.
    prev = [np.asarray(x).copy() for x in jax.tree.leaves(state.params)]
    state2, _ = trainer._train_step(state, batch)
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(prev, jax.tree.leaves(state2.params))
    )
    assert changed


def _preempt_trainer(tmp_path, max_epochs, monitor=None, sub="logs"):
    ds = make_synthetic_dataset(seed=8, num_graphs=32, active_fraction=0.3)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=1, kernels_1hop=(2, 2, 2, 2),
            kernels_nhop=(2, 2, 2, 2), graph_embedding_dim=8,
        ),
        ffn_dropout_rate=0.0,
    )
    cfg = TrainConfig(
        batch_size=8, max_epochs=max_epochs, warmup_iterations=3,
        oversample=False, progress=False,
        log_dir=str(tmp_path / sub),
        autosave_path=str(tmp_path / "auto"),
    )
    return Trainer(model, ds, spec, cfg, monitor=monitor)


def test_fit_autosave_resume(tmp_path):
    """With autosave_path set, a second fit() resumes AFTER the epochs
    already done (full state + history restored) instead of restarting."""
    t1 = _preempt_trainer(tmp_path, max_epochs=2)
    h1 = t1.fit()
    assert len(h1) == 2
    step_after_2 = int(np.asarray(t1.state.step))

    t2 = _preempt_trainer(tmp_path, max_epochs=4, sub="logs2")
    h2 = t2.fit()
    assert len(h2) == 4
    assert [e["epoch"] for e in h2] == [0, 1, 2, 3]
    # The first two epochs came from the restored history, not a re-run.
    assert h2[0]["train_loss"] == h1[0]["train_loss"]
    assert h2[1].keys() == h1[1].keys()
    for k in h1[1]:
        np.testing.assert_equal(h2[1][k], h1[1][k])  # nan-aware
    assert int(np.asarray(t2.state.step)) == 2 * step_after_2


def test_fit_sigterm_finishes_epoch_autosaves_and_resumes(tmp_path):
    """SIGTERM during fit: the current epoch completes, the autosave is
    written, fit returns early — and a restarted fit finishes the
    remaining epochs from the autosave."""
    import os as _os
    import signal as _signal

    class _PreemptAfterFirstEpoch:
        def on_epoch_end(self, epoch, results):
            if epoch == 0:
                _os.kill(_os.getpid(), _signal.SIGTERM)

    t1 = _preempt_trainer(
        tmp_path, max_epochs=5, monitor=_PreemptAfterFirstEpoch()
    )
    h1 = t1.fit()
    assert len(h1) == 1  # finished epoch 0, then stopped early
    assert (tmp_path / "auto.state.msgpack").exists()

    t2 = _preempt_trainer(tmp_path, max_epochs=5, sub="logs2")
    h2 = t2.fit()
    assert [e["epoch"] for e in h2] == [0, 1, 2, 3, 4]


def test_profiler_trace_refuses_relay_backend(tmp_path, monkeypatch):
    """profiler_trace must refuse to start on the relay ('axon') backend:
    jax.profiler.start_trace hangs there and wedges the single-tenant TPU
    grant (measured; CLAUDE.md). force=True overrides."""
    from molkgnn_tpu.training import monitors as M

    monkeypatch.setattr(M, "_is_relay_backend", lambda: True)
    with pytest.raises(M.RelayBackendError, match="relay"):
        with M.profiler_trace(str(tmp_path / "tb")):
            pass
    # enabled=False never touches the backend at all.
    with M.profiler_trace(str(tmp_path / "tb"), enabled=False):
        pass
    # On a non-relay backend (this suite pins CPU) the trace runs.
    monkeypatch.setattr(M, "_is_relay_backend", lambda: False)
    with M.profiler_trace(str(tmp_path / "tb")):
        pass
    assert any((tmp_path / "tb").iterdir())


def test_devsample_autosave_resume_matches_uninterrupted(tmp_path):
    """Device-sampled training is resume-DETERMINISTIC: the sampler keys
    every draw off (state.rng, state.step), both restored by the
    autosave, so an interrupted+resumed fit must land on exactly the
    parameters of an uninterrupted run (same epochs, same seeds)."""
    import jax

    def make(sub, autosave, max_epochs):
        ds = make_synthetic_dataset(
            seed=8, num_graphs=32, active_fraction=0.3
        )
        spec = spec_for_graphs(ds.graphs, batch_size=8)
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=1, kernels_1hop=(2, 2, 2, 2),
                kernels_nhop=(2, 2, 2, 2), graph_embedding_dim=8,
            ),
            ffn_dropout_rate=0.0,
        )
        cfg = TrainConfig(
            batch_size=8, max_epochs=max_epochs, warmup_iterations=3,
            oversample=True, device_sampling=True, scan_steps=2,
            progress=False, log_dir=str(tmp_path / sub),
            autosave_path=autosave,
            # Pin the LR horizon: tot_iterations derives from max_epochs,
            # and the interrupted leg is constructed with a smaller one —
            # a preempted production run must pass the FULL horizon.
            tot_iterations=18,
        )
        return Trainer(model, ds, spec, cfg)

    # Uninterrupted 4-epoch run.
    ref = make("ref", None, 4)
    ref.fit()

    # Interrupted run: 2 epochs, autosave, then a FRESH trainer resumes.
    a_path = str(tmp_path / "auto")
    part1 = make("p1", a_path, 2)
    part1.fit()
    part2 = make("p2", a_path, 4)
    h2 = part2.fit()
    assert [e["epoch"] for e in h2] == [0, 1, 2, 3]
    assert int(np.asarray(part2.state.step)) == int(
        np.asarray(ref.state.step)
    )
    for a, b in zip(
        jax.tree.leaves(ref.state.params),
        jax.tree.leaves(part2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
