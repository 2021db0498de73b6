"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molkgnn_tpu.ops.pallas_kernels import fused_support_score


@pytest.mark.parametrize("m,k,l,p", [(37, 112, 50, 12), (8, 28, 3, 2), (200, 440, 30, 6)])
def test_fused_support_score_matches_xla(m, k, l, p):
    rng = np.random.default_rng(m)
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((p, k, l)).astype(np.float32)

    best, idx = fused_support_score(
        jnp.asarray(a), jnp.asarray(b), interpret=True
    )
    scores = np.einsum("mk,pkl->mlp", a, b)
    np.testing.assert_allclose(
        np.asarray(best), scores.max(axis=2), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(idx), scores.argmax(axis=2))


def test_fused_support_score_tie_break_first():
    """Exact score ties must resolve to the FIRST permutation (torch.max)."""
    a = np.ones((4, 8), np.float32)
    b = np.ones((5, 8, 3), np.float32)  # all perms score identically
    _, idx = fused_support_score(jnp.asarray(a), jnp.asarray(b), interpret=True)
    assert np.all(np.asarray(idx) == 0)


def test_kernelconv_pallas_path_matches_xla_path():
    """use_pallas=True produces the same scores as the XLA path (CPU
    interpret mode)."""
    from molkgnn_tpu.models.kgnn import KernelConv

    rng = np.random.default_rng(3)
    m, deg, F, E = 12, 4, 28, 7
    args = (
        rng.standard_normal((m, F)).astype(np.float32),
        rng.standard_normal((m, 3)).astype(np.float32),
        rng.standard_normal((m, deg, F)).astype(np.float32),
        rng.standard_normal((m, deg, 3)).astype(np.float32),
        rng.standard_normal((m, deg, E)).astype(np.float32),
        np.ones((m,), bool),
        True,
    )
    conv_x = KernelConv(deg=deg, num_kernels=5, node_dim=F, edge_dim=E)
    conv_p = KernelConv(
        deg=deg, num_kernels=5, node_dim=F, edge_dim=E, use_pallas=True
    )
    v = conv_x.init(jax.random.key(0), *args)
    want = np.asarray(conv_x.apply(v, *args))
    got = np.asarray(conv_p.apply(v, *args))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_support_score_gradients_match_xla():
    rng = np.random.default_rng(7)
    m, k, l, p = 10, 24, 6, 4
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((p, k, l)).astype(np.float32))

    def loss_pallas(a, b):
        best, _ = fused_support_score(a, b, interpret=True)
        return jnp.sum(best * best)

    def loss_xla(a, b):
        sc = jnp.einsum("mk,pkl->mlp", a, b)
        return jnp.sum(sc.max(2) ** 2)

    ga = jax.grad(loss_pallas, argnums=(0, 1))(a, b)
    gx = jax.grad(loss_xla, argnums=(0, 1))(a, b)
    for pa, xa in zip(ga, gx):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(xa), rtol=1e-4, atol=1e-5
        )
