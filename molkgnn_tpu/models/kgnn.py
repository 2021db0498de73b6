"""MolKGNN: chirality-aware molecular kernel convolutions, TPU-native.

This is a from-scratch JAX re-design of the reference's core contribution
(/root/reference/models/MolKGNN/kernels.py, KernelLayer.py, MolKGNNNet.py).
The numerical contract is identical (verified against an independent numpy
spec in tests/test_kgnn_spec.py); the computation is reorganized for the MXU:

  * All permutations are scored densely in ONE matmul per degree
    ([M, d*F] x [d*F, L*P]) instead of a Python loop over permutations
    (reference kernels.py:230-252). Cosine similarity == dot product of
    row-normalized operands.
  * The best-permutation gather only ever touches scalars (scores and
    precomputed support determinants), never the [L, P, d, F] tensors
    (replaces kernels.py:197-225, 382-390).
  * The chirality sign (kernels.py:279-350, a per-node-per-kernel Python
    loop and device sync point in the reference) is fully vectorized:
    pairwise-distinct mask over the 6 neighbor pairs + sign comparison of
    signed tetrahedral volumes, where the kernel-side volume is precomputed
    per (kernel, permutation) once per forward.
  * Per-degree score blocks are scatter-added straight into node order,
    eliminating the reference's concat/argsort/transpose epilogue
    (kernels.py:674-747); padded bucket rows are masked to zero, which
    reproduces the reference's implicit "degree 0 or >4 => zero scores".

Scores are [nodes, kernels] throughout (the reference carries [kernels,
nodes] and transposes at the end).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from molkgnn_tpu.graphs.batch import DegreeBucket, GraphBatch
from molkgnn_tpu.models.common import TorchLinear, swish
from molkgnn_tpu.ops.norm import MaskedBatchNorm
from molkgnn_tpu.ops.permutations import perm_table
from molkgnn_tpu.ops.segment import gather_scatter_add, global_add_pool
from molkgnn_tpu.ops.similarity import (
    cosine_matrix,
    neighborhood_similarity,
)


def _randn(key, shape, dtype=jnp.float32):
    import jax.random as jrandom

    return jrandom.normal(key, shape, dtype)


class KernelConv(nn.Module):
    """Score degree-``deg`` neighborhoods against ``num_kernels`` learnable
    molecular kernels (reference KernelConv, kernels.py:9-448).

    Each kernel holds a center-atom feature vector, ``deg`` support-atom
    feature vectors, ``deg`` bond feature vectors, and ``deg`` 3D support
    positions. A neighborhood is scored by the best alignment (over the
    allowed support permutations) of a softmax-weighted sum of three cosine
    scores (support attrs, center attrs, bond attrs); for degree 4 in the
    last layer the score is multiplied by a chirality sign.
    """

    deg: int
    num_kernels: int
    node_dim: int
    edge_dim: int
    pos_dim: int = 3
    init_sc_weight: float = 0.2
    # Reduced-precision MXU contraction for the permutation scoring
    # ('bfloat16' halves scoring bandwidth; accumulation stays fp32).
    matmul_dtype: str | None = None
    # Fused Pallas scoring (matmul + max/argmax over permutations in VMEM,
    # ops/pallas_kernels.py). Inside KernelSetConv all degree buckets share
    # ONE grouped program per K-pad class, so full-model compile is ~40 s
    # (was >10 min with per-degree instantiation). Measured on v5e at the
    # flagship config (4 layers, 10/20/30/50): XLA 1.44 ms/step vs grouped
    # Pallas 1.90 ms/step at batch 1024 — the single wide XLA matmul beats
    # the per-permutation 128-padded tiles at these L (<=50), so XLA stays
    # the default; use_pallas pays off only for much larger kernel counts.
    use_pallas: bool = False
    # Human-designed kernel tensors (reference KernelConv ``init_kernel`` /
    # ``requires_grad``, kernels.py:14-72): a dict with keys x_center
    # [L, F], x_support [L, d, F], edge_attr_support [L, d, Fe], p_support
    # [L, d, 3]. With trainable_kernels=False the tensors are baked into
    # the compiled program as constants (no params, no grads, no optimizer
    # state); the three score weights remain trainable parameters either
    # way (reference ``weight_requires_grad`` defaults True even for fixed
    # sets).
    init_kernel: dict | None = None
    trainable_kernels: bool = True

    def setup(self):
        d, L = self.deg, self.num_kernels

        def kernel_tensor(name, shape):
            if self.init_kernel is not None:
                init_val = np.asarray(self.init_kernel[name], np.float32)
                if init_val.shape != shape:
                    raise ValueError(
                        f"init_kernel[{name!r}]: expected {shape}, "
                        f"got {init_val.shape}"
                    )
                if not self.trainable_kernels:
                    return jnp.asarray(init_val)  # frozen constant
                return self.param(name, lambda k, s: jnp.asarray(init_val), shape)
            return self.param(name, _randn, shape)

        self.x_center = kernel_tensor("x_center", (L, self.node_dim))
        self.x_support = kernel_tensor("x_support", (L, d, self.node_dim))
        self.edge_attr_support = kernel_tensor(
            "edge_attr_support", (L, d, self.edge_dim)
        )
        self.p_support = kernel_tensor("p_support", (L, d, self.pos_dim))
        # length/angle weights exist in reference checkpoints but never enter
        # the score (kernels.py:72-75; see SURVEY §2.1 note) — kept for
        # checkpoint-shape parity.
        w_init = lambda k, s, dt=jnp.float32: jnp.full(s, self.init_sc_weight, dt)
        self.param("length_sc_weight", w_init, ())
        self.param("angle_sc_weight", w_init, ())
        self.w_center = self.param("center_attr_sc_weight", w_init, ())
        self.w_support = self.param("support_attr_sc_weight", w_init, ())
        self.w_edge = self.param("edge_attr_support_sc_weight", w_init, ())

    def support_operands(self, x_nei: jnp.ndarray):
        """Row-normalized (A [M, d*F], B [P, d*F, L]) operands for the
        support-attribute scoring matmul — consumed by the grouped Pallas
        scorer (ops/pallas_kernels.py::grouped_support_score), which returns
        the raw (sum-cosine, argmax) pair fed back via ``support_result``."""
        from molkgnn_tpu.ops.similarity import normalize_rows

        d, L = self.deg, self.num_kernels
        perms = perm_table(d)
        m = x_nei.shape[0]
        a = normalize_rows(x_nei).reshape(m, d * self.node_dim)
        b = (
            normalize_rows(self.x_support[:, perms, :])
            .reshape(L, len(perms), d * self.node_dim)
            .transpose(1, 2, 0)
        )
        return a, b

    def __call__(
        self,
        x_focal: jnp.ndarray,  # [M, F]
        p_focal: jnp.ndarray,  # [M, 3]
        x_nei: jnp.ndarray,  # [M, d, F]
        p_nei: jnp.ndarray,  # [M, d, 3]
        e_nei: jnp.ndarray,  # [M, d, Fe]
        mask: jnp.ndarray,  # [M] bool
        is_last_layer: bool = False,
        support_result=None,  # optional (raw_best [M, L], idx [M, L])
    ) -> jnp.ndarray:  # [M, L]
        d, L = self.deg, self.num_kernels
        x_center = self.x_center
        x_support = self.x_support
        edge_attr_support = self.edge_attr_support
        p_support = self.p_support
        w_center, w_support, w_edge = (
            self.w_center,
            self.w_support,
            self.w_edge,
        )

        perms = perm_table(d)  # [P, d] static

        # --- support-attribute score over all permutations (one matmul) ---
        if support_result is not None:
            best_sc = support_result[0] / d
            best_idx = support_result[1]
        elif self.use_pallas:
            from molkgnn_tpu.ops.pallas_kernels import fused_support_score

            a, b = self.support_operands(x_nei)
            best_sc, best_idx = fused_support_score(a, b)
            best_sc = best_sc / d
        else:
            xs_perm = x_support[:, perms, :]  # [L, P, d, F]
            support_sc = neighborhood_similarity(
                x_nei, xs_perm, matmul_dtype=self._mmdtype()
            )  # [M, L, P]
            best_sc = jnp.max(support_sc, axis=2)  # [M, L]
            best_idx = jnp.argmax(support_sc, axis=2)  # [M, L]

        # --- edge-attribute score at the best alignment ---
        es_perm = edge_attr_support[:, perms, :]  # [L, P, d, Fe]
        edge_sc_all = neighborhood_similarity(
            e_nei, es_perm, matmul_dtype=self._mmdtype()
        )  # [M, L, P]
        edge_sc = jnp.take_along_axis(
            edge_sc_all, best_idx[:, :, None], axis=2
        )[:, :, 0]

        # --- center-attribute score ---
        center_sc = cosine_matrix(x_focal, x_center)  # [M, L]

        # --- softmax-normalized score weights (kernels.py:402-422) ---
        ew = jnp.stack([jnp.exp(w_support), jnp.exp(w_center), jnp.exp(w_edge)])
        ws = ew / jnp.sum(ew)
        sc = best_sc * ws[0] + center_sc * ws[1] + edge_sc * ws[2]

        # --- chirality sign (deg 4, last layer only; kernels.py:279-350,
        #     396-400 + KernelLayer.py:113-117) ---
        if d == 4 and is_last_layer:
            sc = sc * self._chirality_sign(
                x_nei, p_nei - p_focal[:, None, :], p_support, perms, best_idx
            )

        return jnp.where(mask[:, None], sc, 0.0)

    def _mmdtype(self):
        return jnp.dtype(self.matmul_dtype) if self.matmul_dtype else None

    @staticmethod
    def _chirality_sign(
        x_nei: jnp.ndarray,  # [M, 4, F]
        p_nei_c: jnp.ndarray,  # [M, 4, 3] centered at focal
        p_support: jnp.ndarray,  # [L, 4, 3]
        perms: np.ndarray,  # [12, 4]
        best_idx: jnp.ndarray,  # [M, L]
    ) -> jnp.ndarray:  # [M, L] in {+1, -1}
        """Signed-tetrahedral-volume chirality comparison (BCL::EMAS).

        If any two of the four neighbor feature vectors are identical the
        neighborhood is achiral => +1 for all kernels. Otherwise compare the
        sign of det[t1, t2, t3] of the neighborhood against that of the
        best-aligned kernel supports; mismatch flips the score.
        """
        # Neighborhood volume: rows 0,1,2 of the centered positions.
        det_nei = jnp.einsum(
            "mi,mi->m",
            p_nei_c[:, 2],
            jnp.cross(p_nei_c[:, 0], p_nei_c[:, 1]),
        )
        # Kernel volume per permutation: rows perms[p, 0..2] of p_support.
        s = p_support[:, perms, :]  # [L, P, 4, 3]
        det_sup = jnp.einsum(
            "lpi,lpi->lp", s[:, :, 2], jnp.cross(s[:, :, 0], s[:, :, 1])
        )  # [L, P]
        num_kernels = det_sup.shape[0]
        det_sup_best = det_sup[
            jnp.arange(num_kernels)[None, :], best_idx
        ]  # [M, L] -- det_sup[l, best_idx[m, l]]

        sign_match = jnp.sign(det_nei)[:, None] == jnp.sign(det_sup_best)

        # Pairwise-distinct test over the 6 neighbor pairs (exact equality,
        # matching torch.equal at kernels.py:310-317).
        pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        any_equal = jnp.zeros(x_nei.shape[0], dtype=bool)
        for i, j in pairs:
            eq = jnp.all(x_nei[:, i, :] == x_nei[:, j, :], axis=-1)
            any_equal = any_equal | eq

        sign = jnp.where(
            any_equal[:, None], 1.0, jnp.where(sign_match, 1.0, -1.0)
        )
        return sign


class KernelSetConv(nn.Module):
    """Four per-degree KernelConvs assembled into node-order scores
    (reference BaseKernelSetConv/KernelSetConv, kernels.py:451-781).

    Output [N, L1+L2+L3+L4]: node n's row holds its degree-d kernel scores in
    that degree's column block and zeros elsewhere (degree-0 / degree>4 nodes
    are all-zero).
    """

    num_kernels: Tuple[int, int, int, int]
    node_dim: int
    edge_dim: int
    pos_dim: int = 3
    # Edge-partition parallelism: when set, degree-bucket rows are sharded
    # across this mesh axis and the per-degree blocks are psum-combined
    # (parallel/edge_partition.py — deprecated baseline; prefer the halo
    # partition, parallel/halo.py, which does not use this hook).
    psum_axis: str | None = None
    use_pallas: bool = False
    matmul_dtype: str | None = None
    # Per-degree fixed (human-designed, frozen) kernel sets alongside the
    # trainable ones (reference BaseKernelSetConv fixed_kernelconv1..4,
    # kernels.py:451-516): a 4-tuple of Optional[dict] in KernelConv
    # ``init_kernel`` format. A degree's column block is [fixed; trainable]
    # in that order (kernels.py:536-545). Load from disk with
    # analyses.fixed_kernels.load_customized_kernels.
    fixed_kernels: tuple | None = None
    # Sow the node-order score matrix into the 'intermediates' collection
    # (apply(..., mutable=['intermediates'])) — the TPU-native replacement
    # for the reference's in-forward ``save_score`` CSV hook
    # (kernels.py:594-608, 748-749): capture on demand, write on host.
    sow_scores: bool = False

    def block_widths(self) -> Tuple[int, int, int, int]:
        """Kernel-score columns per degree (fixed + trainable)."""
        fixed = self.fixed_kernels or (None,) * 4
        return tuple(
            (0 if f is None else int(np.asarray(f["x_center"]).shape[0]))
            + self.num_kernels[d]
            for d, f in enumerate(fixed)
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [N, F] current node features
        p: jnp.ndarray,  # [N, 3]
        buckets: Sequence[DegreeBucket],
        is_last_layer: bool = False,
    ) -> jnp.ndarray:
        n = x.shape[0]
        fixed = self.fixed_kernels or (None,) * 4
        # entries[d-1]: list of (conv, inputs) for that degree, fixed first
        # (column order [fixed; trainable], kernels.py:536-545).
        entries = [[] for _ in range(4)]
        for d in range(1, 5):
            b = buckets[d - 1]
            inputs = dict(
                x_focal=x[b.focal_index],
                p_focal=p[b.focal_index],
                x_nei=x[b.nei_index],
                p_nei=p[b.nei_index],
                e_nei=b.nei_edge_attr,
                mask=b.mask,
                is_last_layer=is_last_layer,
            )
            if fixed[d - 1] is not None:
                fixed_conv = KernelConv(
                    deg=d,
                    num_kernels=int(
                        np.asarray(fixed[d - 1]["x_center"]).shape[0]
                    ),
                    node_dim=self.node_dim,
                    edge_dim=self.edge_dim,
                    pos_dim=self.pos_dim,
                    use_pallas=self.use_pallas,
                    matmul_dtype=self.matmul_dtype,
                    init_kernel=fixed[d - 1],
                    trainable_kernels=False,
                    name=f"fixed_kernelconv{d}",
                )
                entries[d - 1].append((fixed_conv, inputs))
            conv = KernelConv(
                deg=d,
                num_kernels=self.num_kernels[d - 1],
                node_dim=self.node_dim,
                edge_dim=self.edge_dim,
                pos_dim=self.pos_dim,
                use_pallas=self.use_pallas,
                matmul_dtype=self.matmul_dtype,
                name=f"kernelconv{d}",
            )
            entries[d - 1].append((conv, inputs))

        # With Pallas on, ALL degree buckets (and fixed sets) are scored by
        # ONE grouped kernel call — one compiled program per K-pad class
        # instead of one per (degree, shape) (see grouped_support_score).
        results = [[None] * len(e) for e in entries]
        if self.use_pallas:
            from molkgnn_tpu.ops.pallas_kernels import grouped_support_score

            flat = [
                (di, ei, conv, inputs)
                for di, degree_entries in enumerate(entries)
                for ei, (conv, inputs) in enumerate(degree_entries)
            ]
            ops = [
                conv.support_operands(inputs["x_nei"])
                for _, _, conv, inputs in flat
            ]
            grouped = grouped_support_score(
                [a for a, _ in ops], [b for _, b in ops]
            )
            for (di, ei, _, _), res in zip(flat, grouped):
                results[di][ei] = res

        blocks = []
        for d in range(1, 5):
            b = buckets[d - 1]
            scs = [
                conv(**inputs, support_result=results[d - 1][ei])
                for ei, (conv, inputs) in enumerate(entries[d - 1])
            ]  # each [M_d, L], zero on padded rows
            sc = scs[0] if len(scs) == 1 else jnp.concatenate(scs, axis=1)
            # Scatter-add into node order; padded rows target node 0 with
            # zero contribution, so .add is exact.
            block = jnp.zeros((n, sc.shape[1]), sc.dtype)
            blocks.append(block.at[b.focal_index].add(sc))
        out = jnp.concatenate(blocks, axis=1)
        if self.psum_axis is not None:
            out = jax.lax.psum(out, self.psum_axis)
        if self.sow_scores:
            self.sow("intermediates", "scores", out)
        return out


class MolGCN(nn.Module):
    """Stack of KernelSetConv layers + sum-aggregation message passing
    (reference MolGCN, KernelLayer.py:8-123).

    Layer 0 consumes raw node features; layers 1..L-1 consume the previous
    layer's aggregated kernel-score vector (dimension = sum of previous
    layer's kernel counts). After scoring, each node receives the sum of its
    neighbors' score vectors (h_i = sum_{j in N(i)} sc_j).
    """

    num_layers: int
    kernels_1hop: Tuple[int, int, int, int]
    kernels_nhop: Tuple[int, int, int, int]
    node_dim: int
    edge_dim: int
    pos_dim: int = 3
    psum_axis: str | None = None
    use_pallas: bool = False
    matmul_dtype: str | None = None
    # Fixed kernel sets apply to layer 0 only: human-designed kernels live
    # in the raw node-feature space; deeper layers consume learned
    # kernel-score vectors where no designed kernels exist.
    fixed_kernels: tuple | None = None
    sow_scores: bool = False
    # Framework extension (off = reference parity): apply the deg-4
    # chirality sign at EVERY layer instead of only the last
    # (KernelLayer.py:113-117 gates it on is_last_layer). Measured
    # motivation (benchmarks/QUALITY_RUN.json flagship_enantiomer +
    # QUALITY.md 2b): on PURE-chirality labels the 4-layer stack
    # plateaus at AUC ~0.52 because the last layer's neighbor features
    # have been mixed molecule-wide by 3 rounds of message passing,
    # while layer-0 features still distinguish the stereocenter's
    # substituents; scoring chirality at every layer restores the
    # signal at depth (tests/test_learning.py::
    # test_chirality_every_layer_fixes_deep_models).
    chirality_every_layer: bool = False

    @nn.compact
    def __call__(self, batch: GraphBatch, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        in_dim = self.node_dim
        for i in range(self.num_layers):
            counts = self.kernels_1hop if i == 0 else self.kernels_nhop
            layer = KernelSetConv(
                num_kernels=counts,
                node_dim=in_dim,
                edge_dim=self.edge_dim,
                pos_dim=self.pos_dim,
                psum_axis=self.psum_axis,
                use_pallas=self.use_pallas,
                matmul_dtype=self.matmul_dtype,
                fixed_kernels=self.fixed_kernels if i == 0 else None,
                sow_scores=self.sow_scores,
                name=f"layer{i}",
            )
            sc = layer(
                h,
                batch.p,
                batch.buckets(),
                is_last_layer=(
                    self.chirality_every_layer
                    or i == self.num_layers - 1
                ),
            )
            h = gather_scatter_add(
                sc,
                batch.edge_src,
                batch.edge_dst,
                num_nodes=sc.shape[0],
                edge_mask=batch.edge_mask,
            )
            if self.psum_axis is not None:
                h = jax.lax.psum(h, self.psum_axis)
            in_dim = sum(layer.block_widths())
        return h


class MolKGNNNet(nn.Module):
    """Full MolKGNN graph encoder (reference MolKGNNNet, MolKGNNNet.py:10-149).

    BatchNorm on node features -> MolGCN -> per-node MLP (lin1/swish/dropout/
    lin2) -> global add pool => [B, graph_embedding_dim].

    Reference quirk preserved: an edge-feature BatchNorm exists and updates
    its statistics, but its *output is never used* — kernel edge scores always
    see the raw bond features because the per-degree ``nei_edge_attr`` tensors
    are precomputed before normalization (MolKGNNNet.py:115-116 normalizes
    ``edge_attr``, but KernelSetConv reads ``nei_edge_attr_deg*``,
    kernels.py:634-637). We keep the module for checkpoint parity.
    """

    num_layers: int = 4
    kernels_1hop: Tuple[int, int, int, int] = (10, 20, 30, 50)
    kernels_nhop: Tuple[int, int, int, int] = (10, 20, 30, 50)
    node_dim: int = 28
    edge_dim: int = 7
    pos_dim: int = 3
    graph_embedding_dim: int = 32
    drop_ratio: float = 0.0
    psum_axis: str | None = None
    use_pallas: bool = False
    matmul_dtype: str | None = None
    fixed_kernels: tuple | None = None
    sow_scores: bool = False
    # Framework extension (off = reference parity): see
    # MolGCN.chirality_every_layer.
    chirality_every_layer: bool = False

    @nn.compact
    def __call__(
        self, batch: GraphBatch, train: bool = False
    ) -> jnp.ndarray:
        x = MaskedBatchNorm(self.node_dim, name="node_batch_norm")(
            batch.x, mask=batch.node_mask, use_running_average=not train
        )
        # Dead-path edge BN: stats update only (see class docstring).
        MaskedBatchNorm(self.edge_dim, name="edge_batch_norm")(
            batch.edge_attr, mask=batch.edge_mask, use_running_average=not train
        )

        h = MolGCN(
            num_layers=self.num_layers,
            kernels_1hop=self.kernels_1hop,
            kernels_nhop=self.kernels_nhop,
            node_dim=self.node_dim,
            edge_dim=self.edge_dim,
            pos_dim=self.pos_dim,
            psum_axis=self.psum_axis,
            use_pallas=self.use_pallas,
            matmul_dtype=self.matmul_dtype,
            fixed_kernels=self.fixed_kernels,
            sow_scores=self.sow_scores,
            chirality_every_layer=self.chirality_every_layer,
            name="gnn",
        )(batch, x)

        h = TorchLinear(self.graph_embedding_dim, name="graph_embedding_lin1")(h)
        h = swish(h)
        h = nn.Dropout(rate=self.drop_ratio, deterministic=not train)(h)
        h = TorchLinear(self.graph_embedding_dim, name="graph_embedding_lin2")(h)
        return global_add_pool(
            h,
            batch.node_graph_id,
            num_graphs=batch.num_graphs,
            node_mask=batch.node_mask,
        )
