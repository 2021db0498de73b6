"""Pallas TPU kernels for the kernel-conv hot path.

``fused_support_score``: the support-attribute scoring step computes, for
every neighborhood m and kernel l, the max (and argmax) over permutations p
of a cosine-similarity matmul. The plain XLA path materializes the full
[M, L, P] score tensor to HBM before reducing; this kernel keeps the
per-permutation partial products in VMEM and reduces on the fly — one HBM
write of [M, L] best-scores + [M, L] argmax ids instead of [M, L, P]
activations (P is 12 for degree 4), saving ~P/2x of the scoring
bandwidth at large batch.

The permutation loop is a static Python loop over P <= 12 MXU matmuls per
tile; operands arrive L2-normalized (cosine == dot), with the contraction
dim zero-padded to a lane multiple by the caller-facing wrapper.

Grid: 1-D over M tiles. B (all permuted supports) is small (L*P*K floats,
~1 MB for the deg-4 flagship config) and stays resident in VMEM across the
grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _score_kernel(a_ref, b_ref, best_ref, idx_ref, *, num_perms):
    a = a_ref[:]  # [TM, K]
    best = None
    idx = None
    for p in range(num_perms):
        sc = jnp.dot(
            a, b_ref[p], preferred_element_type=jnp.float32
        )  # [TM, L]
        if best is None:
            best = sc
            idx = jnp.zeros(sc.shape, jnp.int32)
        else:
            take = sc > best  # strict: ties keep the FIRST max (torch.max)
            best = jnp.where(take, sc, best)
            idx = jnp.where(take, jnp.int32(p), idx)
    best_ref[:] = best
    idx_ref[:] = idx


def fused_support_score(
    a: jnp.ndarray,  # [M, K] row-normalized neighborhoods (K = d*F)
    b_perm: jnp.ndarray,  # [P, K, L] row-normalized permuted supports
    interpret: bool | None = None,
):
    if interpret is None:
        # Interpreter mode off-TPU so the same model code runs everywhere.
        interpret = jax.default_backend() != "tpu"
    return _fused_support_score_vjp(a, b_perm, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_support_score_vjp(a, b_perm, interpret):
    return _fused_support_score(a, b_perm, interpret)


def _fss_fwd(a, b_perm, interpret):
    best, idx = _fused_support_score(a, b_perm, interpret)
    return (best, idx), (a, b_perm, idx)


def _fss_bwd(interpret, res, cotangents):
    """Gradient flows only through the argmax-selected permutation:
    dA = sum_p (g * [idx==p]) @ B_p^T, dB_p = A^T @ (g * [idx==p]).
    P small (<=12) static matmuls; no [M, L, P] tensor materialized."""
    a, b_perm, idx = res
    g, _ = cotangents  # idx is integer-valued: no gradient
    p_count = b_perm.shape[0]
    da = jnp.zeros_like(a)
    dbs = []
    for p in range(p_count):
        gp = jnp.where(idx == p, g, 0.0)  # [M, L]
        da = da + jnp.dot(
            gp, b_perm[p].T, preferred_element_type=jnp.float32
        )
        dbs.append(
            jnp.dot(a.T, gp, preferred_element_type=jnp.float32)
        )
    return da, jnp.stack(dbs)


_fused_support_score_vjp.defvjp(_fss_fwd, _fss_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_support_score(a, b_perm, interpret):
    """Returns (best [M, L], argmax_idx [M, L] int32) of a @ b_perm[p] over p.

    Scores here are the *sum* over the flattened (neighbor, feature)
    contraction; the caller divides by the degree to get the mean-cosine
    contract (ops/similarity.py).
    """
    m, k = a.shape
    p_count, k2, l = b_perm.shape
    assert k == k2
    tm = 128 if m >= 128 else _round_up(max(m, 8), 8)
    m_pad = _round_up(m, tm)
    k_pad = _round_up(k, 128)
    l_pad = _round_up(l, 128)
    a_p = jnp.zeros((m_pad, k_pad), a.dtype).at[:m, :k].set(a)
    b_p = jnp.zeros((p_count, k_pad, l_pad), b_perm.dtype).at[
        :, :k, :l
    ].set(b_perm)

    grid = (m_pad // tm,)
    best, idx = pl.pallas_call(
        functools.partial(_score_kernel, num_perms=p_count),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (p_count, k_pad, l_pad),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((tm, l_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, l_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, l_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, l_pad), jnp.int32),
        ],
        interpret=interpret,
    )(a_p, b_p)
    return best[:m, :l], idx[:m, :l]
