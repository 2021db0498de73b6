"""Optimizer construction: AdamW with the kernel-parameter no-decay partition.

Contract: /root/reference/model.py:360-402 — AdamW (torch defaults: b1=0.9,
b2=0.999, eps=1e-8) where kernel parameters named ``x_center``, ``p_support``,
``edge_attr_support`` (but NOT ``edge_attr_support_sc_weight``) and
``x_support`` get weight_decay=0, everything else decays; LR follows the
per-step polynomial warmup-decay schedule. optax.adamw applies decoupled
weight decay scaled by the schedule, matching torch AdamW semantics.
"""

from __future__ import annotations

from typing import Any, Callable

import optax

NO_DECAY_NAMES = ("x_center", "p_support", "edge_attr_support", "x_support")


def _decays(path) -> bool:
    """True if the parameter at ``path`` should be weight-decayed."""
    keys = [getattr(p, "key", str(p)) for p in path]
    for name in keys:
        if "edge_attr_support_sc" in name:
            return True  # the score weight decays (model.py:376)
        if any(nd in name for nd in NO_DECAY_NAMES):
            return False
    return True


def decay_mask(params) -> Any:
    import jax

    return jax.tree_util.tree_map_with_path(
        lambda path, _: _decays(path), params
    )


def make_optimizer(
    params,
    schedule: Callable,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip_norm: float | None = None,
) -> optax.GradientTransformation:
    tx = optax.adamw(
        learning_rate=schedule,
        b1=b1,
        b2=b2,
        eps=eps,
        weight_decay=weight_decay,
        mask=decay_mask(params) if weight_decay else None,
    )
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx
