"""ChIRoNet baseline, TPU-native.

Numerical contract: /root/reference/models/ChIRoNet/alpha_encoder.py +
ChIRoNet.py. GraphNodeEmbedder = edge-conditioned conv (PyG NNConv, add
aggregation, root weight) followed by GAT layers (4 heads, mean over heads,
self-loops); InternalCoordinateEncoder encodes bond lengths (Encoder_D),
angles (Encoder_phi, sin/cos), and torsions with learned phase-shift
sinusoids and sigmoid-normalized c coefficients pooled per local structure
(central bond); optional ChiralMessagePassing injects z_alpha back into the
node graph. The main training path returns the pooled node embedding
(mol_embedding) as the graph representation (ChIRoNet.py:44-57) — note the
reference quirk that the internal-coordinate branch then receives no
gradient unless chiral message passing is enabled; preserved as-is.

TPU design: all path/index/grouping arrays are precomputed host-side with
static caps (graphs/chiro.py); GAT attention is a masked segment softmax
with the self-loop handled analytically (no edge-list mutation); NNConv's
per-edge weight matrices are a batched matmul.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from molkgnn_tpu.graphs.chiro import ChiroBatch
from molkgnn_tpu.models.common import TorchLinear
from molkgnn_tpu.ops.segment import global_add_pool, segment_sum_nodes


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class MLP(nn.Module):
    """Reference MLP (alpha_encoder.py:10-37): LeakyReLU(0.01) hidden,
    identity output, torch Linear init."""

    output_size: int
    hidden_sizes: Tuple[int, ...]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if len(self.hidden_sizes) == 0:
            return TorchLinear(self.output_size, name="lin0")(x)
        h = leaky_relu(TorchLinear(self.hidden_sizes[0], name="lin0")(x))
        for k, size in enumerate(self.hidden_sizes[1:]):
            h = leaky_relu(TorchLinear(size, name=f"lin{k + 1}")(h))
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return TorchLinear(
            self.output_size, name=f"lin{len(self.hidden_sizes)}"
        )(h)


def glorot(key, shape, dtype=jnp.float32):
    return nn.initializers.xavier_uniform()(key, shape, dtype)


class NNConv(nn.Module):
    """PyG NNConv (aggr='add', root_weight=True): h'_i = W x_i +
    sum_j Theta(e_ji) applied to x_j, Theta = MLP -> [F_in, F_out]."""

    out_channels: int
    mlp_hidden: Tuple[int, ...]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_mask, train=False):
        f_in = x.shape[-1]
        theta = MLP(
            f_in * self.out_channels, self.mlp_hidden, self.dropout, name="nn"
        )(edge_attr, train=train)
        theta = theta.reshape(-1, f_in, self.out_channels)
        msgs = jnp.einsum(
            "ef,efo->eo", x[edge_src], theta,
        )
        agg = segment_sum_nodes(
            msgs, edge_dst, num_segments=x.shape[0], mask=edge_mask
        )
        root = self.param("root", glorot, (f_in, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return agg + x @ root + bias


class GATConv(nn.Module):
    """PyG GATConv with add_self_loops=True, concat=False (head-mean):
    masked segment softmax over incoming edges + an analytic self-loop
    term, LeakyReLU(0.2) attention."""

    out_channels: int
    heads: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_mask, train=False):
        H, C = self.heads, self.out_channels
        n = x.shape[0]
        w = self.param("lin", glorot, (x.shape[-1], H * C))
        att_src = self.param("att_src", glorot, (1, H, C))
        att_dst = self.param("att_dst", glorot, (1, H, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        xh = (x @ w).reshape(n, H, C)
        a_src = jnp.sum(xh * att_src, axis=-1)  # [N, H]
        a_dst = jnp.sum(xh * att_dst, axis=-1)  # [N, H]

        # Edge logits for j->i plus a self-loop logit per node.
        e_logit = nn.leaky_relu(
            a_src[edge_src] + a_dst[edge_dst], negative_slope=0.2
        )  # [E, H]
        s_logit = nn.leaky_relu(a_src + a_dst, negative_slope=0.2)  # [N, H]

        # Segment softmax over {incoming edges} U {self}.
        neg = jnp.full_like(e_logit, -jnp.inf)
        e_logit_m = jnp.where(edge_mask[:, None], e_logit, neg)
        seg_max = jax.ops.segment_max(
            e_logit_m, edge_dst, num_segments=n
        )
        seg_max = jnp.maximum(
            jnp.where(jnp.isfinite(seg_max), seg_max, -jnp.inf), s_logit
        )
        e_exp = jnp.where(
            edge_mask[:, None], jnp.exp(e_logit - seg_max[edge_dst]), 0.0
        )
        s_exp = jnp.exp(s_logit - seg_max)
        denom = (
            jax.ops.segment_sum(e_exp, edge_dst, num_segments=n) + s_exp
        )
        alpha_e = e_exp / jnp.maximum(denom[edge_dst], 1e-16)  # [E, H]
        alpha_s = s_exp / jnp.maximum(denom, 1e-16)  # [N, H]
        if train and self.dropout > 0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.dropout, alpha_e.shape
            )
            alpha_e = jnp.where(keep, alpha_e / (1.0 - self.dropout), 0.0)
            rng2 = self.make_rng("dropout")
            keep_s = jax.random.bernoulli(
                rng2, 1.0 - self.dropout, alpha_s.shape
            )
            alpha_s = jnp.where(keep_s, alpha_s / (1.0 - self.dropout), 0.0)

        msgs = xh[edge_src] * alpha_e[:, :, None]  # [E, H, C]
        out = segment_sum_nodes(
            msgs.reshape(-1, H * C), edge_dst, num_segments=n, mask=edge_mask
        ).reshape(n, H, C)
        out = out + xh * alpha_s[:, :, None]
        return out.mean(axis=1) + bias


class InternalCoordinateEncoder(nn.Module):
    """alpha_encoder.py:135-258 with sigmoid c-normalization and
    sum reduction (the main-path defaults, ChIRoNet.py:124-129)."""

    f_z: Tuple[int, int, int]
    f_h: int
    hidden_d: Tuple[int, ...]
    hidden_phi: Tuple[int, ...]
    hidden_c: Tuple[int, ...]
    hidden_shift: Tuple[int, ...]
    hidden_alpha: Tuple[int, ...]
    c_normalization: str = "sigmoid"
    reduction: str = "sum"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h, batch: ChiroBatch, train=False):
        enc_d = MLP(self.f_z[0], self.hidden_d, self.dropout, name="Encoder_D")
        enc_phi = MLP(self.f_z[1], self.hidden_phi, self.dropout, name="Encoder_phi")
        enc_c = MLP(1, self.hidden_c, self.dropout, name="Encoder_c")
        enc_shift = MLP(2, self.hidden_shift, self.dropout, name="Encoder_sinusoidal_shift")
        enc_alpha = MLP(self.f_z[2], self.hidden_alpha, self.dropout, name="Encoder_alpha")

        i, j = batch.dist_i, batch.dist_j
        d = batch.distances[:, None]
        z_d = enc_d(jnp.concatenate([h[i], h[j], d], 1), train) + enc_d(
            jnp.concatenate([h[j], h[i], d], 1), train
        )

        i, j, k = batch.ang_i, batch.ang_j, batch.ang_k
        cs = jnp.cos(batch.angles)[:, None]
        sn = jnp.sin(batch.angles)[:, None]
        z_phi = enc_phi(
            jnp.concatenate([h[i], h[j], h[k], cs, sn], 1), train
        ) + enc_phi(jnp.concatenate([h[k], h[j], h[i], cs, sn], 1), train)

        i, j, k, l = batch.dih_i, batch.dih_j, batch.dih_k, batch.dih_l
        fwd = jnp.concatenate([h[i], h[j], h[k], h[l]], 1)
        rev = jnp.concatenate([h[l], h[k], h[j], h[i]], 1)
        c_tensor = enc_c(fwd, train) + enc_c(rev, train)
        shift = enc_shift(fwd, train) + enc_shift(rev, train)
        shift_norm = jnp.linalg.norm(shift, axis=1, keepdims=True)
        shift = shift / jnp.maximum(shift_norm, 1e-12)
        phase_cos, phase_sin = shift[:, 0:1], shift[:, 1:2]

        num_alpha = batch.alpha_mask.shape[0]
        if self.c_normalization == "softmax":
            logits = jnp.where(batch.dih_mask, c_tensor[:, 0], -jnp.inf)
            mx = jax.ops.segment_max(logits, batch.ls_map, num_segments=num_alpha)
            ex = jnp.where(
                batch.dih_mask, jnp.exp(logits - mx[batch.ls_map]), 0.0
            )
            den = jax.ops.segment_sum(ex, batch.ls_map, num_segments=num_alpha)
            c_norm = (ex / jnp.maximum(den[batch.ls_map], 1e-16))[:, None]
        else:
            c_norm = nn.sigmoid(c_tensor)

        cp = jnp.cos(batch.dihedrals)[:, None]
        sp = jnp.sin(batch.dihedrals)[:, None]
        scaled = (
            jnp.concatenate(
                [cp * phase_cos - sp * phase_sin, sp * phase_cos + cp * phase_sin],
                axis=1,
            )
            * c_norm
        )
        pooled = segment_sum_nodes(
            scaled, batch.ls_map, num_segments=num_alpha, mask=batch.dih_mask
        )
        radii = jnp.linalg.norm(pooled, axis=1, keepdims=True)
        x_, y_ = batch.alpha_x, batch.alpha_y
        z_alpha = enc_alpha(
            jnp.concatenate([h[x_], h[y_], radii], 1), train
        ) + enc_alpha(jnp.concatenate([h[y_], h[x_], radii], 1), train)

        B = batch.num_graphs
        gid = batch.node_graph_id
        pool = lambda v, idx, m: segment_sum_nodes(
            v, gid[idx], num_segments=B, mask=m
        )
        z_d_pooled = pool(z_d, batch.dist_i, batch.dist_mask)
        z_phi_pooled = pool(z_phi, batch.ang_i, batch.ang_mask)
        z_alpha_pooled = pool(z_alpha, batch.alpha_x, batch.alpha_mask)
        if self.reduction in ("mean", "average"):
            cnt = lambda idx, m: jnp.maximum(
                jax.ops.segment_sum(
                    m.astype(jnp.float32), gid[idx], num_segments=B
                ),
                1.0,
            )[:, None]
            z_d_pooled = z_d_pooled / cnt(batch.dist_i, batch.dist_mask)
            z_phi_pooled = z_phi_pooled / cnt(batch.ang_i, batch.ang_mask)
            z_alpha_pooled = z_alpha_pooled / cnt(batch.alpha_x, batch.alpha_mask)
        z = jnp.concatenate([z_d_pooled, z_phi_pooled, z_alpha_pooled], 1)
        return z, z_alpha


class ChIRoNet(nn.Module):
    f_z: Tuple[int, int, int] = (8, 8, 8)
    f_h: int = 64
    f_h_econv: int = 64
    econv_mlp_hidden: Tuple[int, ...] = (32, 32)
    gat_hidden: Tuple[int, ...] = (64,)
    gat_heads: int = 4
    hidden_d: Tuple[int, ...] = (64, 64)
    hidden_phi: Tuple[int, ...] = (64, 64)
    hidden_c: Tuple[int, ...] = (64, 64)
    hidden_shift: Tuple[int, ...] = (256, 256)
    hidden_alpha: Tuple[int, ...] = (64, 64)
    c_normalization: str = "sigmoid"
    reduction: str = "sum"
    chiral_message_passing: bool = False
    cmp_econv_hidden: Tuple[int, ...] = (256, 256)
    cmp_gat_layers: int = 3
    cmp_gat_heads: int = 2
    dropout: float = 0.0
    # Reference ``output_concatenation_mode`` (alpha_encoder.py:352-366):
    #   'molecule'  — pooled GNN embedding only. This is what the MAIN
    #                 path uses (ChIRoNet.py:54 keeps mol_embedding and
    #                 discards the internal-coordinate latent), so it is
    #                 the default; internal coordinates then reach the
    #                 output only via chiral_message_passing.
    #   'conformer' — the InternalCoordinateEncoder latent only.
    #   'both'      — concat(mol_embedding, latent) (ChIRo's standalone
    #                 harness default, train_models.py).
    output_mode: str = "molecule"

    @nn.compact
    def __call__(self, batch: ChiroBatch, train: bool = False) -> jnp.ndarray:
        h = NNConv(
            self.f_h_econv, self.econv_mlp_hidden, self.dropout, name="EConv"
        )(
            batch.x, batch.edge_src, batch.edge_dst, batch.edge_attr,
            batch.edge_mask, train,
        )
        dims = tuple(self.gat_hidden) + (self.f_h,)
        for gi, dim in enumerate(dims):
            h = GATConv(dim, self.gat_heads, self.dropout, name=f"GAT{gi}")(
                h, batch.edge_src, batch.edge_dst, batch.edge_mask, train
            )

        latent, z_alpha = InternalCoordinateEncoder(
            self.f_z, self.f_h, self.hidden_d, self.hidden_phi,
            self.hidden_c, self.hidden_shift, self.hidden_alpha,
            self.c_normalization, self.reduction, self.dropout,
            name="InternalCoordinateEncoder",
        )(h, batch, train)

        if self.chiral_message_passing:
            h = NNConv(
                self.f_h, self.cmp_econv_hidden, self.dropout,
                name="ChiralEConv",
            )(
                h, batch.alpha_x, batch.alpha_y, z_alpha, batch.alpha_mask,
                train,
            )
            for gi in range(self.cmp_gat_layers):
                h = GATConv(
                    self.f_h, self.cmp_gat_heads, self.dropout,
                    name=f"ChiralGAT{gi}",
                )(h, batch.edge_src, batch.edge_dst, batch.edge_mask, train)

        # Zero padded nodes before pooling (EConv/GAT biases leak there).
        mol_embedding = global_add_pool(
            h, batch.node_graph_id, batch.num_graphs, node_mask=batch.node_mask
        )
        if self.output_mode == "molecule":
            return mol_embedding
        if self.output_mode == "conformer":
            return latent
        if self.output_mode == "both":
            return jnp.concatenate([mol_embedding, latent], axis=-1)
        raise ValueError(f"unknown output_mode {self.output_mode!r}")
