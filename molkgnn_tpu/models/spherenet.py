"""SphereNet baseline, TPU-native.

Numerical contract: the reference's local re-implementation
(/root/reference/models/ChIRoNet/gnn_3D/spherenet.py — the spec for the
`dig`-imported encoder the main path trains, models/SphereNet/SphereNet.py:1):
edge-resident messages with distance / angle / torsion embeddings
(spherical Bessel x real spherical harmonics incl. m != 0 torsion
harmonics), init/update_e/update_v/update_u blocks, per-layer accumulated
graph output.

TPU design: radius graph, angle triplets, AND torsion candidate pairs are
precomputed host-side with static caps (graphs/geometric.py). The
per-triplet minimum-torsion reduction (spherenet.py:87-112: dihedral of
each other in-neighbor k_n of j vs the triplet's k, mapped to (0, 2pi],
scatter-min) runs as a masked segment-min. Symbolic bases are lambdified
once at build (ops/basis.py). Note the reference's angle/torsion embeddings
apply NO envelope to their radial part (commented out, spherenet.py:300,
332) — replicated.

Init parity: glorot-orthogonal (scale 2) everywhere the reference resets;
embedding uniform(-sqrt3, sqrt3); update_v output layer GlorotOrthogonal
(the reference's default output_init).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from molkgnn_tpu.graphs.geometric import PointBatch
from molkgnn_tpu.models.common import TorchLinear, swish
from molkgnn_tpu.models.dimenetpp import GlorotLinear, ResidualLayer
from molkgnn_tpu.ops.basis import (
    bessel_basis_fns,
    bessel_rbf,
    real_sph_harm_fns,
    real_sph_harm_m_fns,
)
from molkgnn_tpu.ops.segment import global_add_pool, segment_sum_nodes


def _angle_emb(dist, angle, num_spherical, num_radial, cutoff):
    """angle_emb (spherenet.py:291-310): b_ln(d/c) * Y_l0(angle), no
    envelope; evaluated per-triplet (dist already gathered to triplets)."""
    x = dist / cutoff
    bfns = bessel_basis_fns(num_spherical, num_radial)
    rbf = jnp.stack(
        [bfns[l][n](x) for l in range(num_spherical) for n in range(num_radial)],
        axis=1,
    ).reshape(-1, num_spherical, num_radial)
    sfns = real_sph_harm_fns(num_spherical)
    cbf = jnp.stack([f(angle) for f in sfns], axis=1)
    out = rbf * cbf[:, :, None]
    return out.reshape(-1, num_spherical * num_radial)


def _torsion_emb(dist, angle, phi, num_spherical, num_radial, cutoff):
    """torsion_emb (spherenet.py:313-345): harmonics Y_lm(theta, phi) for
    all -l <= m <= l flattened to n^2 entries; entry h pairs with bessel
    order h % n (the reference's view() quirk).

    Per-l column order matches the reference's list layout as consumed by
    its ``range(-i, i+1)`` read (spherenet.py:355-358 over the
    real_sph_harm list, where ``Y[i][-j]`` lands at index 2i+1-j):
    [m=0, cos(1..l), sin(l..1)] — verified against the reference's own
    sympy codegen in tests/test_reference_parity_3d.py."""
    n, k = num_spherical, num_radial
    x = dist / cutoff
    bfns = bessel_basis_fns(n, k)
    rbf = jnp.stack(
        [bfns[l][r](x) for l in range(n) for r in range(k)], axis=1
    ).reshape(-1, n, k)
    mf = real_sph_harm_m_fns(n)
    harmonics = []
    for l in range(n):
        if l == 0:
            harmonics.append(mf[0][0](angle, phi))
        else:
            # m >= 0 cos forms first, then m < 0 sin forms (descending |m|);
            # sin form == cos form of |m| with phi -> phi - pi/(2m).
            for m in range(0, l + 1):
                harmonics.append(mf[l][m](angle, phi))
            for m in range(l, 0, -1):
                harmonics.append(_y_lm_sin(mf, l, m, angle, phi))
    cbf = jnp.stack(harmonics, axis=1)  # [Q?, n*n]
    out = rbf[:, None, :, :] * cbf.reshape(-1, n, n)[:, :, :, None]
    return out.reshape(-1, n * n * k)


def _y_lm_sin(mf, l, m, theta, phi):
    """Real harmonic with sin(m phi): cos-form evaluated at phi shifted by
    pi/(2m) since cos(m(phi - pi/2m)) = sin(m phi)."""
    return mf[l][m](theta, phi - jnp.pi / (2 * m))


class SphereNetInit(nn.Module):
    """init block (spherenet.py:411-446)."""

    hidden_channels: int
    use_node_features: bool = True

    @nn.compact
    def __call__(self, z, rbf, i, j):
        h = self.hidden_channels
        if self.use_node_features:
            def _emb_init(key, shape, dtype=jnp.float32):
                s = math.sqrt(3)
                return jax.random.uniform(key, shape, dtype, -s, s)

            table = self.param("emb", _emb_init, (95, h))
            x = table[jnp.clip(z, 0, 94)]
        else:
            vec = self.param("node_embedding", nn.initializers.normal(1.0), (h,))
            x = jnp.broadcast_to(vec[None, :], (z.shape[0], h))
        rbf0 = swish(TorchLinear(h, name="lin_rbf_0")(rbf))
        e1 = swish(
            TorchLinear(h, name="lin")(
                jnp.concatenate([x[i], x[j], rbf0], axis=-1)
            )
        )
        e2 = GlorotLinear(h, use_bias=False, name="lin_rbf_1")(rbf) * e1
        return e1, e2


class SphereNetUpdateE(nn.Module):
    """update_e (spherenet.py:449-536)."""

    hidden_channels: int
    int_emb_size: int
    basis_emb_size_dist: int
    basis_emb_size_angle: int
    basis_emb_size_torsion: int
    num_before_skip: int
    num_after_skip: int

    @nn.compact
    def __call__(self, e, rbf0, sbf, tbf, idx_kj, idx_ji, tri_mask):
        h = self.hidden_channels
        x1, _ = e
        x_ji = swish(GlorotLinear(h, name="lin_ji")(x1))
        x_kj = swish(GlorotLinear(h, name="lin_kj")(x1))

        rbf = GlorotLinear(self.basis_emb_size_dist, use_bias=False, name="lin_rbf1")(rbf0)
        rbf = GlorotLinear(h, use_bias=False, name="lin_rbf2")(rbf)
        x_kj = x_kj * rbf
        x_kj = swish(GlorotLinear(self.int_emb_size, use_bias=False, name="lin_down")(x_kj))

        sbf_p = GlorotLinear(self.basis_emb_size_angle, use_bias=False, name="lin_sbf1")(sbf)
        sbf_p = GlorotLinear(self.int_emb_size, use_bias=False, name="lin_sbf2")(sbf_p)
        x_t = x_kj[idx_kj] * sbf_p

        t_p = GlorotLinear(self.basis_emb_size_torsion, use_bias=False, name="lin_t1")(tbf)
        t_p = GlorotLinear(self.int_emb_size, use_bias=False, name="lin_t2")(t_p)
        x_t = x_t * t_p

        x_kj = segment_sum_nodes(
            x_t, idx_ji, num_segments=x1.shape[0], mask=tri_mask
        )
        x_kj = swish(GlorotLinear(h, use_bias=False, name="lin_up")(x_kj))

        e1 = x_ji + x_kj
        for k in range(self.num_before_skip):
            e1 = ResidualLayer(h, name=f"before_skip{k}")(e1)
        e1 = swish(GlorotLinear(h, name="lin")(e1)) + x1
        for k in range(self.num_after_skip):
            e1 = ResidualLayer(h, name=f"after_skip{k}")(e1)
        e2 = GlorotLinear(h, use_bias=False, name="lin_rbf")(rbf0) * e1
        return e1, e2


class SphereNetUpdateV(nn.Module):
    """update_v (spherenet.py:539-570), output_init='GlorotOrthogonal'."""

    hidden_channels: int
    out_emb_channels: int
    out_channels: int
    num_output_layers: int

    @nn.compact
    def __call__(self, e, i, num_nodes, edge_mask):
        _, e2 = e
        v = segment_sum_nodes(e2, i, num_segments=num_nodes, mask=edge_mask)
        v = GlorotLinear(self.out_emb_channels, name="lin_up")(v)
        for k in range(self.num_output_layers):
            v = swish(GlorotLinear(self.out_emb_channels, name=f"lin{k}")(v))
        return GlorotLinear(self.out_channels, use_bias=False, name="lin")(v)


class SphereNet(nn.Module):
    cutoff: float = 5.0
    num_layers: int = 4
    hidden_channels: int = 128
    out_channels: int = 32
    int_emb_size: int = 64
    basis_emb_size_dist: int = 8
    basis_emb_size_angle: int = 8
    basis_emb_size_torsion: int = 8
    out_emb_channels: int = 256
    num_spherical: int = 7
    num_radial: int = 6
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 3
    use_node_features: bool = True

    @nn.compact
    def __call__(self, batch: PointBatch, train: bool = False) -> jnp.ndarray:
        j, i = batch.edge_src, batch.edge_dst
        pos = batch.pos
        dist = jnp.linalg.norm(pos[i] - pos[j], axis=-1)
        dist = jnp.where(batch.edge_mask, dist, self.cutoff)

        # Angles at j between j->i and j->k (spherenet.py:80-86).
        idx_kj, idx_ji = batch.tri_edge_kj, batch.tri_edge_ji
        t_j, t_i, t_k = j[idx_ji], i[idx_ji], batch.tri_k
        v_ji = pos[t_i] - pos[t_j]
        v_jk = pos[t_k] - pos[t_j]
        a = jnp.sum(v_ji * v_jk, axis=-1)
        b = jnp.linalg.norm(jnp.cross(v_ji, v_jk), axis=-1)
        angle = jnp.arctan2(b, a)
        angle = jnp.where(batch.tri_mask, angle, 0.0)

        # Torsion: per (triplet, k_n) dihedral, min per triplet
        # (spherenet.py:87-112); k_n == k yields 2*pi by construction.
        q_t, q_kn = batch.quad_t, batch.quad_kn
        qj = t_j[q_t]
        p_j0 = pos[t_k[q_t]] - pos[qj]
        p_ji = pos[t_i[q_t]] - pos[qj]
        p_jk = pos[q_kn] - pos[qj]
        dist_ji = jnp.linalg.norm(p_ji, axis=-1)
        plane1 = jnp.cross(p_ji, p_j0)
        plane2 = jnp.cross(p_ji, p_jk)
        ta = jnp.sum(plane1 * plane2, axis=-1)
        tb = jnp.sum(jnp.cross(plane1, plane2) * p_ji, axis=-1) / jnp.maximum(
            dist_ji, 1e-9
        )
        # Numerical robustness beyond the reference: the k_n == k candidate
        # (and near-coplanar ones) has sin(torsion) ~ 0 where fp noise flips
        # atan2 between ~0 and ~2*pi. The reference hits exactly-0 only for
        # bitwise-identical planes; we snap |sin| < 1e-4 with cos > 0 to the
        # same deterministic 2*pi branch so torsions are rotation-stable.
        hyp = jnp.sqrt(ta * ta + tb * tb)
        tb = jnp.where((jnp.abs(tb) < 1e-4 * hyp) & (ta > 0), 0.0, tb)
        torsion1 = jnp.arctan2(tb, ta)
        torsion1 = jnp.where(torsion1 <= 0, torsion1 + 2 * jnp.pi, torsion1)
        torsion1 = jnp.where(batch.quad_mask, torsion1, jnp.inf)
        torsion = jax.ops.segment_min(
            torsion1, q_t, num_segments=batch.tri_mask.shape[0]
        )
        # Empty segments (padded triplets / no candidates) -> 0, matching
        # torch_scatter's fill value.
        torsion = jnp.where(jnp.isfinite(torsion), torsion, 0.0)

        freq = self.param(
            "rbf_freq",
            lambda k, s: jnp.arange(1, self.num_radial + 1, dtype=jnp.float32)
            * jnp.pi,
            (self.num_radial,),
        )
        rbf = bessel_rbf(dist, freq, self.cutoff, self.envelope_exponent)
        dist_t = jnp.where(batch.tri_mask, dist[idx_kj], self.cutoff)
        sbf = _angle_emb(
            dist_t, angle, self.num_spherical, self.num_radial, self.cutoff
        )
        tbf = _torsion_emb(
            dist_t, angle, torsion, self.num_spherical, self.num_radial,
            self.cutoff,
        )

        e = SphereNetInit(
            self.hidden_channels,
            self.use_node_features,
            name="init_e",
        )(batch.z, rbf, i, j)
        v = SphereNetUpdateV(
            self.hidden_channels, self.out_emb_channels, self.out_channels,
            self.num_output_layers, name="init_v",
        )(e, i, batch.num_nodes, batch.edge_mask)
        u = global_add_pool(
            v, batch.node_graph_id, batch.num_graphs, node_mask=batch.node_mask
        )

        for layer in range(self.num_layers):
            e = SphereNetUpdateE(
                self.hidden_channels, self.int_emb_size,
                self.basis_emb_size_dist, self.basis_emb_size_angle,
                self.basis_emb_size_torsion, self.num_before_skip,
                self.num_after_skip, name=f"update_e{layer}",
            )(e, rbf, sbf, tbf, idx_kj, idx_ji, batch.tri_mask)
            v = SphereNetUpdateV(
                self.hidden_channels, self.out_emb_channels,
                self.out_channels, self.num_output_layers,
                name=f"update_v{layer}",
            )(e, i, batch.num_nodes, batch.edge_mask)
            u = u + global_add_pool(
                v, batch.node_graph_id, batch.num_graphs,
                node_mask=batch.node_mask,
            )
        return u
