"""Parity checks against PyTorch primitives (torch CPU is available here).

These validate that our re-implementations of torch-semantics pieces (batch
norm, BCE loss, AdamW decay behavior) match the library the reference was
built on — without importing any reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from molkgnn_tpu.ops.norm import MaskedBatchNorm
from molkgnn_tpu.training.model import bce_with_logits_loss


def test_masked_batchnorm_matches_torch_train_and_eval():
    rng = np.random.default_rng(0)
    n, f = 37, 7
    x = rng.standard_normal((n, f)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(f)
    bn = MaskedBatchNorm(f)
    variables = bn.init(jax.random.key(0), jnp.asarray(x))

    # Two training steps (running stats accumulate), then eval.
    for step in range(2):
        xs = x + step  # shift so the two batches differ
        want = tbn(torch.tensor(xs)).detach().numpy()
        got, updates = bn.apply(
            variables,
            jnp.asarray(xs),
            mask=jnp.ones((n,), bool),
            use_running_average=False,
            mutable=["batch_stats"],
        )
        variables = {**variables, "batch_stats": updates["batch_stats"]}
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )

    tbn.eval()
    want = tbn(torch.tensor(x)).detach().numpy()
    got = bn.apply(
        variables,
        jnp.asarray(x),
        mask=jnp.ones((n,), bool),
        use_running_average=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_masked_batchnorm_padding_equivalence():
    """Stats over a padded batch with mask == stats over the unpadded batch."""
    rng = np.random.default_rng(1)
    n, pad, f = 20, 12, 5
    x = rng.standard_normal((n, f)).astype(np.float32)
    xp = np.concatenate([x, np.zeros((pad, f), np.float32)])
    mask = np.array([True] * n + [False] * pad)

    bn = MaskedBatchNorm(f)
    v = bn.init(jax.random.key(0), jnp.asarray(x))
    got_pad, up_pad = bn.apply(
        v, jnp.asarray(xp), mask=jnp.asarray(mask), mutable=["batch_stats"]
    )
    got, up = bn.apply(
        v, jnp.asarray(x), mask=jnp.ones((n,), bool), mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(got_pad)[:n], np.asarray(got), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(up_pad["batch_stats"]["mean"]),
        np.asarray(up["batch_stats"]["mean"]),
        rtol=1e-6,
    )


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal(33).astype(np.float32) * 3
    labels = (rng.random(33) < 0.4).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    got = float(
        bce_with_logits_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.ones(33, bool)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_adamw_step_matches_torch():
    """One AdamW step with decoupled weight decay: optax vs torch."""
    import optax

    rng = np.random.default_rng(3)
    w = rng.standard_normal(11).astype(np.float32)
    g = rng.standard_normal(11).astype(np.float32)
    lr, wd = 1e-2, 1e-3

    tp = torch.tensor(w, requires_grad=True)
    opt = torch.optim.AdamW([tp], lr=lr, weight_decay=wd)
    tp.grad = torch.tensor(g)
    opt.step()

    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    state = tx.init(jnp.asarray(w))
    up, _ = tx.update(jnp.asarray(g), state, jnp.asarray(w))
    got = np.asarray(jnp.asarray(w) + up)
    np.testing.assert_allclose(got, tp.detach().numpy(), rtol=1e-5, atol=1e-7)
