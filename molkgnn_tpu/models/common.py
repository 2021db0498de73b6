"""Shared model building blocks."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (PyG's ``swish``/SiLU, used across the reference)."""
    return x * nn.sigmoid(x)


class TorchLinear(nn.Module):
    """Dense layer with PyTorch ``nn.Linear`` default initialization.

    torch init: weight ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform
    with a=sqrt(5)), bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Matching the
    init distribution keeps optimization dynamics comparable to the reference
    for training-quality parity runs.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

        def _uniform(key, shape, dtype=jnp.float32):
            import jax.random as jrandom

            return jrandom.uniform(
                key, shape, dtype, minval=-bound, maxval=bound
            )

        kernel = self.param("kernel", _uniform, (fan_in, self.features))
        y = jnp.dot(
            x,
            kernel,
            preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
        )
        if self.use_bias:
            bias = self.param("bias", _uniform, (self.features,))
            y = y + bias
        return y
