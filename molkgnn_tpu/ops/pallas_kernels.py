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
import numpy as np
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


# ---------------------------------------------------------------------------
# Grouped scorer: ONE compiled program for all degree buckets of a layer.
#
# Round-1 problem: fused_support_score instantiates one Pallas program per
# (M, K, L, P) — a 4-layer flagship model needed 8+ distinct remote TPU
# compiles (>10 min wall clock), making use_pallas impractical. Here all
# degree buckets are concatenated along M (each padded to the tile size),
# their permuted-support tensors stacked into one [G, P_max, K_pad, L_pad]
# array, and a scalar-prefetched tile->group map routes each M-tile to its
# group's B block (the megablocks-style grouped-matmul pattern). Distinct
# programs per model: one per K_pad class (layer 0 vs N-hop layers), i.e.
# 2 for the flagship config instead of 8.
#
# Efficiency notes:
#   * consecutive tiles of the same group hit the same B block index, so
#     Pallas skips the re-copy — B streams from HBM once per group, not per
#     tile;
#   * groups with fewer than P_max permutations skip the dead matmuls via
#     pl.when predication on the prefetched per-group perm count;
#   * argmax semantics match torch.max (first max wins) because updates use
#     a strict '>'.
# ---------------------------------------------------------------------------


def grouped_support_score(a_list, b_list, interpret: bool | None = None):
    """Score G groups in one Pallas program.

    a_list[g]: [M_g, K_g] row-normalized neighborhoods.
    b_list[g]: [P_g, K_g, L_g] row-normalized permuted supports.
    Returns [(best [M_g, L_g], idx [M_g, L_g] int32)] * G.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = _GroupedSpec(
        m=tuple(a.shape[0] for a in a_list),
        k=tuple(a.shape[1] for a in a_list),
        l=tuple(b.shape[2] for b in b_list),
        p=tuple(b.shape[0] for b in b_list),
        interpret=bool(interpret),
    )
    outs = _grouped_vjp(spec, tuple(a_list), tuple(b_list))
    return list(zip(outs[0], outs[1]))


class _GroupedSpec(tuple):
    """Hashable static layout (m, k, l, p tuples + interpret flag)."""

    def __new__(cls, m, k, l, p, interpret):
        return super().__new__(cls, (m, k, l, p, interpret))

    m = property(lambda s: s[0])
    k = property(lambda s: s[1])
    l = property(lambda s: s[2])
    p = property(lambda s: s[3])
    interpret = property(lambda s: s[4])


_GROUP_TM = 128


def _grouped_kernel(tile_group_ref, nperm_ref, a_ref, b_ref, best_ref,
                    idx_ref, *, p_max):
    g = tile_group_ref[pl.program_id(0)]
    npg = nperm_ref[g]
    a = a_ref[:]  # [TM, K_pad]
    best_ref[:] = jnp.dot(
        a, b_ref[0, 0], preferred_element_type=jnp.float32
    )
    idx_ref[:] = jnp.zeros(best_ref.shape, jnp.int32)
    for p in range(1, p_max):

        @pl.when(p < npg)
        def _():
            sc = jnp.dot(
                a, b_ref[0, p], preferred_element_type=jnp.float32
            )
            take = sc > best_ref[:]  # strict: first max wins (torch.max)
            idx_ref[:] = jnp.where(take, jnp.int32(p), idx_ref[:])
            best_ref[:] = jnp.where(take, sc, best_ref[:])


def _grouped_impl(spec: _GroupedSpec, a_list, b_list):
    tm = _GROUP_TM
    k_pad = _round_up(max(spec.k), 128)
    l_pad = _round_up(max(spec.l), 128)
    p_max = max(spec.p)
    m_pads = [_round_up(max(m, 1), tm) for m in spec.m]
    offsets = np.concatenate([[0], np.cumsum(m_pads)])
    m_tot = int(offsets[-1])

    a_cat = jnp.zeros((m_tot, k_pad), jnp.float32)
    for g, a in enumerate(a_list):
        a_cat = a_cat.at[
            int(offsets[g]) : int(offsets[g]) + a.shape[0], : a.shape[1]
        ].set(a)

    b_stack = jnp.zeros((len(b_list), p_max, k_pad, l_pad), jnp.float32)
    for g, b in enumerate(b_list):
        b_stack = b_stack.at[
            g, : b.shape[0], : b.shape[1], : b.shape[2]
        ].set(b)

    tile_group = np.repeat(
        np.arange(len(a_list), dtype=np.int32),
        [mp // tm for mp in m_pads],
    )
    nperm = np.asarray(spec.p, np.int32)
    n_tiles = len(tile_group)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, k_pad), lambda i, tg, np_: (i, 0)),
            pl.BlockSpec(
                (1, p_max, k_pad, l_pad),
                lambda i, tg, np_: (tg[i], 0, 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((tm, l_pad), lambda i, tg, np_: (i, 0)),
            pl.BlockSpec((tm, l_pad), lambda i, tg, np_: (i, 0)),
        ],
    )
    best, idx = pl.pallas_call(
        functools.partial(_grouped_kernel, p_max=p_max),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m_tot, l_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_tot, l_pad), jnp.int32),
        ],
        interpret=spec.interpret,
    )(jnp.asarray(tile_group), jnp.asarray(nperm), a_cat, b_stack)

    bests, idxs = [], []
    for g in range(len(a_list)):
        o = int(offsets[g])
        bests.append(best[o : o + spec.m[g], : spec.l[g]])
        idxs.append(idx[o : o + spec.m[g], : spec.l[g]])
    return tuple(bests), tuple(idxs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _grouped_vjp(spec, a_tuple, b_tuple):
    return _grouped_impl(spec, a_tuple, b_tuple)


def _grouped_fwd(spec, a_tuple, b_tuple):
    bests, idxs = _grouped_impl(spec, a_tuple, b_tuple)
    return (bests, idxs), (a_tuple, b_tuple, idxs)


def _grouped_bwd(spec, res, cotangents):
    """Per group, gradient flows only through the argmax-selected
    permutation (same math as _fss_bwd)."""
    a_tuple, b_tuple, idxs = res
    g_bests, _ = cotangents
    das, dbs = [], []
    for a, b_perm, idx, g in zip(a_tuple, b_tuple, idxs, g_bests):
        da = jnp.zeros_like(a)
        db = []
        for p in range(b_perm.shape[0]):
            gp = jnp.where(idx == p, g, 0.0)
            da = da + jnp.dot(
                gp, b_perm[p].T, preferred_element_type=jnp.float32
            )
            db.append(jnp.dot(a.T, gp, preferred_element_type=jnp.float32))
        das.append(da)
        dbs.append(jnp.stack(db))
    return tuple(das), tuple(dbs)


_grouped_vjp.defvjp(_grouped_fwd, _grouped_bwd)


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
