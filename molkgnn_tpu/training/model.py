"""GNNModel: encoder wrapper + prediction head.

Contract: /root/reference/model.py:21-174 — any graph encoder producing a
[B, out_dim] graph embedding, followed by dropout and a single linear FFN to
``task_dim`` logits. (The reference also constructs lin1/lin2 but only ``ffn``
is used in forward, model.py:165-174; we build just the live path.)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from molkgnn_tpu.graphs.batch import GraphBatch
from molkgnn_tpu.models.common import TorchLinear


class GNNModel(nn.Module):
    encoder: nn.Module
    task_dim: int = 1
    ffn_dropout_rate: float = 0.25

    @nn.compact
    def __call__(
        self, batch: GraphBatch, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        graph_embedding = self.encoder(batch, train=train)
        h = nn.Dropout(rate=self.ffn_dropout_rate, deterministic=not train)(
            graph_embedding
        )
        prediction = TorchLinear(self.task_dim, name="ffn")(h)
        return prediction[..., 0], graph_embedding


def bce_with_logits_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean BCEWithLogitsLoss over real graphs (reference data.py:37).

    Numerically stable form: max(x, 0) - x*y + log1p(exp(-|x|)).
    """
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    m = mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def mse_sum_loss(
    pred: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """MSELoss(reduction='sum') for D4DCHP regression (data.py:53)."""
    m = mask.astype(pred.dtype)
    return jnp.sum(((pred - labels) ** 2) * m)


LOSSES: dict[str, Any] = {
    "bce_with_logits": bce_with_logits_loss,
    "mse_sum": mse_sum_loss,
}
