"""Independent numpy spec oracle for the SchNet forward pass.

Written straight from the architecture contract (reference schnet.py:29-103,
155-172): gaussian distance embedding, cosine-cutoff-gated filter MLP,
scatter-sum node update with residual MLP, readout MLP + graph scatter.
Validates the flax implementation end-to-end with real parameters.
"""

import jax
import numpy as np

from molkgnn_tpu.data.dataset import make_synthetic_dataset
from molkgnn_tpu.graphs.geometric import batch_points, point_spec_for_graphs
from molkgnn_tpu.models.schnet import SchNet


def shifted_softplus(x):
    return np.logaddexp(0.0, x) - np.log(2.0)


def schnet_spec(params, batch, cutoff, num_layers, num_gaussians):
    z = np.asarray(batch.z)
    pos = np.asarray(batch.pos)
    j, i = np.asarray(batch.edge_src), np.asarray(batch.edge_dst)
    emask = np.asarray(batch.edge_mask)
    nmask = np.asarray(batch.node_mask)

    dist = np.linalg.norm(pos[i] - pos[j], axis=-1)
    dist = np.where(emask, dist, cutoff)
    offsets = np.linspace(0.0, cutoff, num_gaussians)
    coeff = -0.5 / (offsets[1] - offsets[0]) ** 2
    dist_emb = np.exp(coeff * (dist[:, None] - offsets[None, :]) ** 2)

    def lin(name, x, bias=True):
        p = params[name]
        out = x @ np.asarray(p["kernel"])
        if bias and "bias" in p:
            out = out + np.asarray(p["bias"])
        return out

    v = np.asarray(params["init_v"])[np.clip(z, 0, 99)]
    n = v.shape[0]
    for layer in range(num_layers):
        C = 0.5 * (np.cos(dist * np.pi / cutoff) + 1.0)
        W = lin(f"mlp1_{layer}", dist_emb)
        W = shifted_softplus(W)
        W = lin(f"mlp2_{layer}", W) * C[:, None]
        vw = lin(f"lin_{layer}", v, bias=False)
        e = vw[j] * W
        agg = np.zeros((n, e.shape[1]), np.float64)
        np.add.at(agg, i[emask], e[emask])
        out = shifted_softplus(lin(f"uv1_{layer}", agg))
        out = lin(f"uv2_{layer}", out)
        v = v + out

    v = shifted_softplus(lin("uu1", v))
    v = lin("uu2", v)
    v = np.where(nmask[:, None], v, 0.0)
    B = np.asarray(batch.y).shape[0]
    u = np.zeros((B, v.shape[1]), np.float64)
    np.add.at(u, np.asarray(batch.node_graph_id)[nmask], v[nmask])
    return u


def test_schnet_matches_numpy_spec():
    ds = make_synthetic_dataset(seed=17, num_graphs=8)
    spec = point_spec_for_graphs(ds.graphs, batch_size=4, cutoff=4.0)
    batch = batch_points(ds.graphs[:4], spec)
    model = SchNet(cutoff=4.0, num_layers=2, hidden_channels=16,
                   num_filters=16, num_gaussians=13, out_channels=6)
    variables = model.init(jax.random.key(0), batch)
    got = np.asarray(model.apply(variables, batch))

    # flax params: GaussianSmearing has no params; flatten module tree.
    p = variables["params"]
    flat = {}
    for k, v in p.items():
        flat[k] = v
    want = schnet_spec(flat, batch, cutoff=4.0, num_layers=2, num_gaussians=13)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
