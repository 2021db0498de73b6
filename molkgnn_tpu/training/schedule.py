"""Polynomial warmup-decay learning-rate schedule.

Contract: /root/reference/lr.py:17-31 (Graphormer's PolynomialDecayLR),
stepped per-iteration. torch's ``_LRScheduler`` is 1-indexed — the first
optimizer step runs at ``_step_count == 1`` — so the optax schedule (called
with 0-based ``count``) evaluates at ``count + 1``.
"""

from __future__ import annotations

import jax.numpy as jnp


def polynomial_warmup_decay(
    peak_lr: float,
    end_lr: float,
    warmup_iterations: int,
    tot_iterations: int,
    power: float = 1.0,
):
    def schedule(count):
        step = count + 1  # torch _LRScheduler 1-indexing
        warmup_lr = peak_lr * step / jnp.maximum(warmup_iterations, 1)
        pct_remaining = 1.0 - (step - warmup_iterations) / jnp.maximum(
            tot_iterations - warmup_iterations, 1
        )
        decay_lr = (peak_lr - end_lr) * pct_remaining**power + end_lr
        lr = jnp.where(
            step <= warmup_iterations,
            warmup_lr,
            jnp.where(step >= tot_iterations, end_lr, decay_lr),
        )
        return lr

    return schedule
