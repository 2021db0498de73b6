"""Numpy spec oracle for ChIRoNet's InternalCoordinateEncoder.

Written from the reference semantics (alpha_encoder.py:197-258): symmetrized
distance/angle/torsion encoders, normalized phase-shift sinusoids, sigmoid c
coefficients, per-local-structure pooled rotations, alpha encoding over
pooled radii, and sum-reduction per graph.
"""

import jax
import numpy as np
import pytest

from molkgnn_tpu.chem.embed import embed_molecule
from molkgnn_tpu.chem.smiles import parse_smiles
from molkgnn_tpu.graphs.chiro import batch_chiro, chiro_spec_for_graphs, mol_to_chiro_graph
from molkgnn_tpu.models.chironet import InternalCoordinateEncoder


def leaky(x):
    return np.where(x > 0, x, 0.01 * x)


def mlp(params, x):
    names = sorted(params.keys(), key=lambda s: int(s[3:]))
    for k, name in enumerate(names):
        x = x @ np.asarray(params[name]["kernel"]) + np.asarray(
            params[name]["bias"]
        )
        if k < len(names) - 1:
            x = leaky(x)
    return x


def ice_spec(params, h, b, f_z):
    i, j = np.asarray(b.dist_i), np.asarray(b.dist_j)
    d = np.asarray(b.distances)[:, None]
    enc = lambda name, x: mlp(params[name], x)
    z_d = enc("Encoder_D", np.concatenate([h[i], h[j], d], 1)) + enc(
        "Encoder_D", np.concatenate([h[j], h[i], d], 1)
    )

    ai, aj, ak = np.asarray(b.ang_i), np.asarray(b.ang_j), np.asarray(b.ang_k)
    cs = np.cos(np.asarray(b.angles))[:, None]
    sn = np.sin(np.asarray(b.angles))[:, None]
    z_phi = enc(
        "Encoder_phi", np.concatenate([h[ai], h[aj], h[ak], cs, sn], 1)
    ) + enc("Encoder_phi", np.concatenate([h[ak], h[aj], h[ai], cs, sn], 1))

    si, sj, sk, sl = (
        np.asarray(b.dih_i), np.asarray(b.dih_j),
        np.asarray(b.dih_k), np.asarray(b.dih_l),
    )
    fwd = np.concatenate([h[si], h[sj], h[sk], h[sl]], 1)
    rev = np.concatenate([h[sl], h[sk], h[sj], h[si]], 1)
    c = enc("Encoder_c", fwd) + enc("Encoder_c", rev)
    shift = enc("Encoder_sinusoidal_shift", fwd) + enc(
        "Encoder_sinusoidal_shift", rev
    )
    norm = np.maximum(np.linalg.norm(shift, axis=1, keepdims=True), 1e-12)
    shift = shift / norm
    pc, ps = shift[:, 0:1], shift[:, 1:2]
    c_norm = 1.0 / (1.0 + np.exp(-c))

    cp = np.cos(np.asarray(b.dihedrals))[:, None]
    sp = np.sin(np.asarray(b.dihedrals))[:, None]
    scaled = np.concatenate([cp * pc - sp * ps, sp * pc + cp * ps], 1) * c_norm
    smask = np.asarray(b.dih_mask)
    num_alpha = np.asarray(b.alpha_mask).shape[0]
    pooled = np.zeros((num_alpha, 2))
    np.add.at(pooled, np.asarray(b.ls_map)[smask], scaled[smask])
    radii = np.linalg.norm(pooled, axis=1, keepdims=True)

    x_, y_ = np.asarray(b.alpha_x), np.asarray(b.alpha_y)
    z_alpha = enc(
        "Encoder_alpha", np.concatenate([h[x_], h[y_], radii], 1)
    ) + enc("Encoder_alpha", np.concatenate([h[y_], h[x_], radii], 1))

    B = np.asarray(b.y).shape[0]
    gid = np.asarray(b.node_graph_id)

    def pool(v, idx, m):
        out = np.zeros((B, v.shape[1]))
        np.add.at(out, gid[idx][m], v[m])
        return out

    z = np.concatenate(
        [
            pool(z_d, i, np.asarray(b.dist_mask)),
            pool(z_phi, ai, np.asarray(b.ang_mask)),
            pool(z_alpha, x_, np.asarray(b.alpha_mask)),
        ],
        1,
    )
    return z, z_alpha


def test_ice_matches_numpy_spec():
    smis = ["CCO", "CC(=O)O", "CCCC", "CCN(C)C"]
    graphs = []
    for k, s in enumerate(smis):
        m = parse_smiles(s, add_hs=True)
        pos = embed_molecule(m, seed=k, iterations=60)
        for idx, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[idx])
        graphs.append(mol_to_chiro_graph(m, y=float(k % 2), idx=k))
    spec = chiro_spec_for_graphs(graphs, batch_size=3)
    batch = batch_chiro(graphs[:3], spec)

    f_h = 10
    rng = np.random.default_rng(0)
    h = rng.standard_normal((batch.num_nodes, f_h)).astype(np.float32)

    ice = InternalCoordinateEncoder(
        f_z=(4, 5, 6), f_h=f_h, hidden_d=(8,), hidden_phi=(8,),
        hidden_c=(8,), hidden_shift=(8,), hidden_alpha=(8,),
    )
    variables = ice.init(jax.random.key(0), h, batch)
    z, z_alpha = ice.apply(variables, h, batch)
    want_z, want_alpha = ice_spec(variables["params"], h, batch, (4, 5, 6))
    np.testing.assert_allclose(np.asarray(z), want_z, rtol=2e-4, atol=2e-4)
    am = np.asarray(batch.alpha_mask)
    np.testing.assert_allclose(
        np.asarray(z_alpha)[am], want_alpha[am], rtol=2e-4, atol=2e-4
    )
