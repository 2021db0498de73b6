"""Masked batch normalization with PyTorch ``BatchNorm1d`` semantics.

The reference normalizes node and edge features over the whole (unpadded)
batch (/root/reference/models/MolKGNN/MolKGNNNet.py:26-27, 115-116). Our
batches carry padded rows, so statistics must be computed over real rows only;
with a full mask this reduces exactly to torch semantics:

  * train: normalize with biased batch variance; update running stats with the
    *unbiased* variance using momentum 0.1 (new = (1-m)*old + m*batch).
  * eval:  normalize with running stats.
  * eps = 1e-5, learnable affine (weight init 1, bias init 0).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.num_features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.num_features,))
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                count = jnp.asarray(x.shape[0], x.dtype)
                mean = jnp.mean(x, axis=0)
                var = jnp.mean((x - mean) ** 2, axis=0)
            else:
                m = mask.astype(x.dtype)[:, None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=0) / count
                var = jnp.sum(((x - mean) ** 2) * m, axis=0) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps)) * weight + bias
        if mask is not None:
            y = jnp.where(mask[:, None], y, 0.0)
        return y
