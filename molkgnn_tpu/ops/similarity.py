"""Cosine-similarity scoring as MXU matmuls.

The reference scores neighborhoods against kernels with per-row cosine
similarity averaged over neighbors (/root/reference/models/MolKGNN/
kernels.py:154-195, 230-275). On TPU we exploit that cosine similarity of
row-normalized tensors is a plain dot product: normalizing each (row) vector
once and contracting over the flattened (neighbor, feature) axes turns the
whole [L, P, M] score tensor into a single [M, d*F] x [d*F, L*P] matmul that
runs on the systolic array — no per-permutation loop, no gather.

eps semantics: torch's CosineSimilarity computes dot / max(|a|*|b|, 1e-8).
We normalize each side by max(|v|, eps_n) with a tiny eps_n; the two agree
except when both norms are ~1e-8 (true zero rows give 0 in both). Padded
bucket rows are masked downstream, so this is a non-issue in practice and is
covered by the parity tests.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def normalize_rows(t: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2-normalize along ``axis`` with zero-safe clamping."""
    n = jnp.linalg.norm(t, axis=axis, keepdims=True)
    return t / jnp.maximum(n, _EPS)


def _acc_dtype(dtype) -> jnp.dtype:
    """Accumulation dtype: fp32 for fp32/bf16 operands (MXU native), fp64
    when the caller runs in double precision (x64 parity tests)."""
    return jnp.promote_types(dtype, jnp.float32)


def cosine_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise cosine similarity: a [M, F], b [L, F] -> [M, L]."""
    return jnp.dot(
        normalize_rows(a),
        normalize_rows(b).T,
        preferred_element_type=_acc_dtype(a.dtype),
    )


def neighborhood_similarity(
    nei: jnp.ndarray,
    support_perm: jnp.ndarray,
    matmul_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """Mean-over-neighbors cosine score for every (node, kernel, permutation).

    Args:
      nei: [M, d, F] neighborhood attributes (node or edge features).
      support_perm: [L, P, d, F] permuted kernel supports.
      matmul_dtype: optional reduced precision (e.g. bfloat16) for the MXU
        contraction; normalization stays in fp32 and accumulation is fp32
        (preferred_element_type), so only the mantissa of the normalized
        operands is rounded (~3 decimal digits — plenty for cosine scores
        whose useful range is [-1, 1]).

    Returns:
      [M, L, P] scores: mean_d cos(nei[m, d], support_perm[l, p, d]).
    """
    m, d, f = nei.shape
    l, p = support_perm.shape[0], support_perm.shape[1]
    a = normalize_rows(nei).reshape(m, d * f)
    b = normalize_rows(support_perm).reshape(l * p, d * f)
    if matmul_dtype is not None:
        a = a.astype(matmul_dtype)
        b = b.astype(matmul_dtype)
    sc = jnp.dot(a, b.T, preferred_element_type=_acc_dtype(nei.dtype)) / d
    return sc.reshape(m, l, p)
