"""Checkpoint persistence: orbax when available, flax msgpack fallback.

Replaces PL ModelCheckpoint file handling (reference entry.py:187-237,
model.py:404-434). Checkpoints store {step, params, batch_stats}; optimizer
state is intentionally excluded to match the reference's eval-time-only
checkpoints (no mid-epoch resume in the contract; full-state resume is a
framework extension hook).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:  # orbax is the idiomatic JAX checkpointer
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(path: str, payload: Any) -> None:
    payload = jax.tree.map(np.asarray, payload)
    if _HAVE_ORBAX:
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
    else:
        from flax import serialization

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(payload))


def load_checkpoint(path: str, target: Any = None) -> Any:
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    from flax import serialization

    with open(path + ".msgpack", "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)
