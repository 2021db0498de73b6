"""DimeNet++ baseline, TPU-native.

Numerical contract: /root/reference/models/ChIRoNet/gnn_3D/dimenet_pp.py
(and its PyG building blocks): edge-resident messages, Bessel radial basis
over radius-graph distances, spherical basis over k->j->i triplet angles,
InteractionPPBlock with rbf/sbf projections + residual layers, per-block
OutputPPBlock contributions summed and pooled per graph.

TPU design: the radius graph AND the triplet index arrays are precomputed on
the host with static caps (graphs/geometric.py) — replacing torch-sparse's
SparseTensor row-slicing (dimenet_pp.py:304-325) — so the device work is
dense gathers, elementwise basis evaluation (closed-form lambdified sympy,
ops/basis.py), and segment sums. Angles use the same atan2(|cross|, dot)
formulation (dimenet_pp.py:336-346).

Init parity: interaction blocks use glorot-orthogonal (scale 2.0); output
blocks keep torch Linear defaults (the reference never calls their
reset_parameters — dimenet_pp.py:296-302); embedding uniform(-sqrt(3),
sqrt(3)).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from molkgnn_tpu.graphs.geometric import PointBatch
from molkgnn_tpu.models.common import TorchLinear, swish
from molkgnn_tpu.ops.basis import bessel_rbf, spherical_sbf
from molkgnn_tpu.ops.segment import global_add_pool, segment_sum_nodes


def glorot_orthogonal(scale: float = 2.0):
    def init(key, shape, dtype=jnp.float32):
        w = jax.nn.initializers.orthogonal()(key, shape, dtype)
        fan_in, fan_out = shape[0], shape[1]
        target_var = scale * 2.0 / (fan_in + fan_out)
        return w * jnp.sqrt(target_var / jnp.maximum(jnp.var(w), 1e-12))

    return init


class GlorotLinear(nn.Module):
    features: int
    use_bias: bool = True
    scale: float = 2.0

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", glorot_orthogonal(self.scale), (x.shape[-1], self.features)
        )
        y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class ResidualLayer(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = swish(GlorotLinear(self.hidden, name="lin1")(x))
        h = swish(GlorotLinear(self.hidden, name="lin2")(h))
        return x + h


class InteractionPPBlock(nn.Module):
    hidden_channels: int
    int_emb_size: int
    basis_emb_size: int
    num_before_skip: int
    num_after_skip: int

    @nn.compact
    def __call__(self, x, rbf, sbf, idx_kj, idx_ji, tri_mask):
        h = self.hidden_channels
        x_ji = swish(GlorotLinear(h, name="lin_ji")(x))
        x_kj = swish(GlorotLinear(h, name="lin_kj")(x))

        rbf_p = GlorotLinear(self.basis_emb_size, use_bias=False, name="lin_rbf1")(rbf)
        rbf_p = GlorotLinear(h, use_bias=False, name="lin_rbf2")(rbf_p)
        x_kj = x_kj * rbf_p

        x_kj = swish(GlorotLinear(self.int_emb_size, use_bias=False, name="lin_down")(x_kj))

        sbf_p = GlorotLinear(self.basis_emb_size, use_bias=False, name="lin_sbf1")(sbf)
        sbf_p = GlorotLinear(self.int_emb_size, use_bias=False, name="lin_sbf2")(sbf_p)
        t = x_kj[idx_kj] * sbf_p  # [T, int_emb]
        x_kj = segment_sum_nodes(
            t, idx_ji, num_segments=x.shape[0], mask=tri_mask
        )
        x_kj = swish(GlorotLinear(h, use_bias=False, name="lin_up")(x_kj))

        out = x_ji + x_kj
        for k in range(self.num_before_skip):
            out = ResidualLayer(h, name=f"before_skip{k}")(out)
        out = swish(GlorotLinear(h, name="lin")(out)) + x
        for k in range(self.num_after_skip):
            out = ResidualLayer(h, name=f"after_skip{k}")(out)
        return out


class OutputPPBlock(nn.Module):
    hidden_channels: int
    out_emb_channels: int
    out_channels: int
    num_layers: int

    @nn.compact
    def __call__(self, x, rbf, i, num_nodes, edge_mask):
        # torch-default inits (reference never resets output blocks).
        g = TorchLinear(self.hidden_channels, use_bias=False, name="lin_rbf")(rbf)
        x = g * x
        x = segment_sum_nodes(x, i, num_segments=num_nodes, mask=edge_mask)
        x = TorchLinear(self.out_emb_channels, name="lin_up")(x)
        for k in range(self.num_layers):
            x = swish(TorchLinear(self.out_emb_channels, name=f"lin{k}")(x))
        return TorchLinear(self.out_channels, use_bias=False, name="lin")(x)


class DimeNetPP(nn.Module):
    hidden_channels: int = 128
    out_channels: int = 32
    num_blocks: int = 4
    int_emb_size: int = 64
    basis_emb_size: int = 8
    out_emb_channels: int = 256
    num_spherical: int = 7
    num_radial: int = 6
    cutoff: float = 5.0
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 3

    @nn.compact
    def __call__(self, batch: PointBatch, train: bool = False) -> jnp.ndarray:
        j, i = batch.edge_src, batch.edge_dst
        pos = batch.pos
        dist = jnp.linalg.norm(pos[i] - pos[j], axis=-1)
        dist = jnp.where(batch.edge_mask, dist, self.cutoff)

        # Triplet angles (dimenet_pp.py:336-346): idx arrays precomputed.
        idx_kj, idx_ji = batch.tri_edge_kj, batch.tri_edge_ji
        t_j, t_i = j[idx_ji], i[idx_ji]
        t_k = batch.tri_k
        pos_ji = pos[t_j] - pos[t_i]
        pos_kj = pos[t_k] - pos[t_j]
        a = jnp.sum(pos_ji * pos_kj, axis=-1)
        b = jnp.linalg.norm(jnp.cross(pos_ji, pos_kj), axis=-1)
        angle = jnp.arctan2(b, a)
        angle = jnp.where(batch.tri_mask, angle, 0.0)

        freq = self.param(
            "rbf_freq",
            lambda k, s: jnp.arange(1, self.num_radial + 1, dtype=jnp.float32)
            * jnp.pi,
            (self.num_radial,),
        )
        rbf = bessel_rbf(dist, freq, self.cutoff, self.envelope_exponent)
        sbf = spherical_sbf(
            jnp.where(batch.tri_mask, dist[idx_kj], self.cutoff),
            angle,
            jnp.arange(angle.shape[0]),
            self.num_spherical,
            self.num_radial,
            self.cutoff,
            self.envelope_exponent,
        )

        # EmbeddingBlock (PyG): emb(z) uniform(-sqrt3, sqrt3); message per
        # edge from cat(x_i, x_j, rbf) — TARGET embedding first, matching
        # PyG's EmbeddingBlock and the same family's init block in the
        # reference (spherenet.py:441: cat([x[i], x[j], rbf0])). Round-2
        # carried cat(x_j, x_i, ...) here — caught by the full-forward
        # reference parity test (VERDICT r2 item 4).
        def _emb_init(key, shape, dtype=jnp.float32):
            s = math.sqrt(3)
            return jax.random.uniform(key, shape, dtype, minval=-s, maxval=s)

        emb_table = self.param("emb", _emb_init, (95, self.hidden_channels))
        xz = emb_table[jnp.clip(batch.z, 0, 94)]
        rbf_h = swish(TorchLinear(self.hidden_channels, name="emb_lin_rbf")(rbf))
        x = swish(
            TorchLinear(self.hidden_channels, name="emb_lin")(
                jnp.concatenate([xz[i], xz[j], rbf_h], axis=-1)
            )
        )

        P = OutputPPBlock(
            self.hidden_channels,
            self.out_emb_channels,
            self.out_channels,
            self.num_output_layers,
            name="output0",
        )(x, rbf, i, batch.num_nodes, batch.edge_mask)

        for blk in range(self.num_blocks):
            x = InteractionPPBlock(
                self.hidden_channels,
                self.int_emb_size,
                self.basis_emb_size,
                self.num_before_skip,
                self.num_after_skip,
                name=f"interaction{blk}",
            )(x, rbf, sbf, idx_kj, idx_ji, batch.tri_mask)
            P = P + OutputPPBlock(
                self.hidden_channels,
                self.out_emb_channels,
                self.out_channels,
                self.num_output_layers,
                name=f"output{blk + 1}",
            )(x, rbf, i, batch.num_nodes, batch.edge_mask)

        return global_add_pool(
            P, batch.node_graph_id, batch.num_graphs, node_mask=batch.node_mask
        )
