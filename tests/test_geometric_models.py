"""3D baseline tests: radius/triplet precompute, SchNet, DimeNet++."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molkgnn_tpu.data.dataset import make_synthetic_dataset
from molkgnn_tpu.graphs.geometric import (
    batch_points,
    point_spec_for_graphs,
    radius_edges,
    triplet_index,
)
from molkgnn_tpu.models.dimenetpp import DimeNetPP
from molkgnn_tpu.models.schnet import SchNet


def test_radius_edges_oracle():
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((12, 3)).astype(np.float32) * 2
    cutoff = 2.5
    e = radius_edges(pos, cutoff)
    # Oracle: brute force pairs.
    want = set()
    for i in range(12):
        for j in range(12):
            if i != j and np.linalg.norm(pos[i] - pos[j]) < cutoff:
                want.add((j, i))
    got = set(zip(e[0].tolist(), e[1].tolist()))
    assert got == want
    # Symmetric
    assert all((i, j) in got for (j, i) in got)


def test_triplet_index_oracle():
    rng = np.random.default_rng(1)
    pos = rng.standard_normal((8, 3)).astype(np.float32)
    e = radius_edges(pos, 2.0)
    t = triplet_index(e, 8)
    src, dst = e
    want = set()
    for e_ji in range(e.shape[1]):
        j, i = src[e_ji], dst[e_ji]
        for e_kj in range(e.shape[1]):
            if dst[e_kj] == j and src[e_kj] != i:
                want.add((e_kj, e_ji, src[e_kj]))
    got = set(zip(t[0].tolist(), t[1].tolist(), t[2].tolist()))
    assert got == want
    # Consistency: for each triplet, dst(e_kj) == src(e_ji).
    for e_kj, e_ji, k in zip(*t):
        assert dst[e_kj] == src[e_ji]
        assert src[e_kj] == k


@pytest.fixture(scope="module")
def point_setup():
    ds = make_synthetic_dataset(seed=3, num_graphs=16)
    spec = point_spec_for_graphs(
        ds.graphs, batch_size=4, cutoff=4.0, with_triplets=True
    )
    batch = batch_points(ds.graphs[:4], spec)
    return ds, spec, batch


def test_schnet_forward_and_padding_invariance(point_setup):
    ds, spec, batch = point_setup
    model = SchNet(cutoff=4.0, num_layers=2, hidden_channels=32,
                   num_filters=32, out_channels=8)
    v = model.init(jax.random.key(0), batch)
    out = jax.jit(lambda v, b: model.apply(v, b))(v, batch)
    assert out.shape == (4, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    b2 = batch_points(ds.graphs[:2], spec)
    out2 = model.apply(v, b2)
    np.testing.assert_allclose(
        np.asarray(out2[:2]), np.asarray(out[:2]), rtol=1e-5, atol=1e-5
    )


def test_dimenetpp_forward_and_padding_invariance(point_setup):
    ds, spec, batch = point_setup
    model = DimeNetPP(
        hidden_channels=32, out_channels=8, num_blocks=2, int_emb_size=16,
        basis_emb_size=4, out_emb_channels=24, num_spherical=5, num_radial=4,
        cutoff=4.0,
    )
    v = model.init(jax.random.key(0), batch)
    out = jax.jit(lambda v, b: model.apply(v, b))(v, batch)
    assert out.shape == (4, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    b2 = batch_points(ds.graphs[:2], spec)
    out2 = model.apply(v, b2)
    np.testing.assert_allclose(
        np.asarray(out2[:2]), np.asarray(out[:2]), rtol=1e-4, atol=1e-4
    )


def test_dimenetpp_rotation_invariance(point_setup):
    """DimeNet++ uses only distances and angles => rotating coordinates
    must not change outputs."""
    import dataclasses

    ds, spec, batch = point_setup
    model = DimeNetPP(
        hidden_channels=16, out_channels=4, num_blocks=1, int_emb_size=8,
        basis_emb_size=4, out_emb_channels=16, num_spherical=4, num_radial=4,
        cutoff=4.0,
    )
    v = model.init(jax.random.key(1), batch)
    out = model.apply(v, batch)
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    rotated = dataclasses.replace(batch, pos=batch.pos @ R.T)
    out_r = model.apply(v, rotated)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_r), rtol=1e-4, atol=1e-4
    )


def test_bessel_basis_against_scipy():
    """Lambdified symbolic radial basis matches scipy spherical_jn."""
    from scipy.special import spherical_jn

    from molkgnn_tpu.ops.basis import bessel_basis_fns, bessel_zeros

    n, k = 5, 4
    fns = bessel_basis_fns(n, k)
    zeros = bessel_zeros(n, k)
    # Domain restricted to physically reachable x = d/cutoff (shortest bond
    # ~0.9A over cutoff 5A => x >= ~0.15): below that the fp32 closed form
    # loses precision for high l — identically to the reference's
    # sympy->torch fp32 evaluation.
    x = np.linspace(0.15, 0.999, 17)
    for l in range(n):
        for i in range(k):
            norm = 1.0 / np.sqrt(
                0.5 * spherical_jn(l + 1, zeros[l, i]) ** 2
            )
            want = norm * spherical_jn(l, zeros[l, i] * x)
            got = np.asarray(fns[l][i](jnp.asarray(x)))
            # fp32 closed-form evaluation suffers cancellation at small
            # arguments for high l (the reference's sympy->torch fp32 path
            # behaves identically); tolerance reflects that.
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_torsion_pairs_oracle():
    from molkgnn_tpu.graphs.geometric import torsion_pairs

    rng = np.random.default_rng(5)
    pos = rng.standard_normal((7, 3)).astype(np.float32)
    e = radius_edges(pos, 2.5)
    t = triplet_index(e, 7)
    q = torsion_pairs(e, t, 7)
    src, dst = e
    want = set()
    for ti in range(t.shape[1]):
        e_ji = t[1, ti]
        j, i = src[e_ji], dst[e_ji]
        for eid in range(e.shape[1]):
            if dst[eid] == j and src[eid] != i:
                want.add((ti, src[eid]))
    got = set(zip(q[0].tolist(), q[1].tolist()))
    assert got == want


def test_spherenet_forward_rotation_invariance_and_padding():
    import dataclasses

    from molkgnn_tpu.models.spherenet import SphereNet

    ds = make_synthetic_dataset(seed=7, num_graphs=8)
    spec = point_spec_for_graphs(
        ds.graphs, batch_size=3, cutoff=3.5, with_torsion=True
    )
    batch = batch_points(ds.graphs[:3], spec)
    model = SphereNet(
        cutoff=3.5, num_layers=1, hidden_channels=16, out_channels=4,
        int_emb_size=8, basis_emb_size_dist=4, basis_emb_size_angle=4,
        basis_emb_size_torsion=4, out_emb_channels=16, num_spherical=3,
        num_radial=3, num_output_layers=1,
    )
    v = model.init(jax.random.key(0), batch)
    out = jax.jit(lambda v, b: model.apply(v, b))(v, batch)
    assert out.shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(out)))

    # padding invariance
    b2 = batch_points(ds.graphs[:2], spec)
    out2 = model.apply(v, b2)
    np.testing.assert_allclose(
        np.asarray(out2[:2]), np.asarray(out[:2]), rtol=2e-4, atol=2e-4
    )

    # rotation invariance (dist/angle/torsion only)
    theta = 1.1
    R = np.array(
        [
            [1, 0, 0],
            [0, np.cos(theta), -np.sin(theta)],
            [0, np.sin(theta), np.cos(theta)],
        ],
        np.float32,
    )
    rotated = dataclasses.replace(batch, pos=batch.pos @ R.T)
    out_r = model.apply(v, rotated)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_r), rtol=2e-3, atol=2e-3
    )


def test_mirror_invariance_contract_across_families(point_setup):
    """The chirality contract of the 3DGN trio, as a bitwise property
    (r5; discovered forensically in the AID-scale enantiomer quality runs,
    QUALITY.md): SchNet (distances) and DimeNet++ (distances + angles)
    must be EXACTLY mirror-invariant — reflection negates one coordinate,
    which every squared-difference and |cross| path absorbs bit-for-bit —
    while SphereNet's torsion channel (phi -> -phi under mirror) must NOT
    be. A regression here either leaks handedness into the invariant
    models (their enantiomer null results become leakage) or kills the
    one channel through which SphereNet can see it."""
    import dataclasses

    ds, spec, batch = point_setup
    mirrored = dataclasses.replace(
        batch, pos=batch.pos * jnp.array([-1.0, 1.0, 1.0])
    )

    schnet = SchNet(cutoff=4.0, num_layers=2, hidden_channels=16,
                    num_filters=16, out_channels=4)
    v = schnet.init(jax.random.key(0), batch)
    f = jax.jit(lambda v, b: schnet.apply(v, b))
    np.testing.assert_array_equal(
        np.asarray(f(v, batch)), np.asarray(f(v, mirrored))
    )

    dime = DimeNetPP(
        hidden_channels=16, out_channels=4, num_blocks=1, int_emb_size=8,
        basis_emb_size=4, out_emb_channels=16, num_spherical=4,
        num_radial=4, cutoff=4.0,
    )
    v = dime.init(jax.random.key(1), batch)
    f = jax.jit(lambda v, b: dime.apply(v, b))
    np.testing.assert_array_equal(
        np.asarray(f(v, batch)), np.asarray(f(v, mirrored))
    )

    from molkgnn_tpu.models.spherenet import SphereNet

    ds2 = make_synthetic_dataset(seed=7, num_graphs=8)
    spec2 = point_spec_for_graphs(
        ds2.graphs, batch_size=3, cutoff=3.5, with_torsion=True
    )
    b3 = batch_points(ds2.graphs[:3], spec2)
    m3 = dataclasses.replace(b3, pos=b3.pos * jnp.array([-1.0, 1.0, 1.0]))
    sphere = SphereNet(
        cutoff=3.5, num_layers=1, hidden_channels=16, out_channels=4,
        int_emb_size=8, basis_emb_size_dist=4, basis_emb_size_angle=4,
        basis_emb_size_torsion=4, out_emb_channels=16, num_spherical=3,
        num_radial=3, num_output_layers=1,
    )
    v = sphere.init(jax.random.key(2), b3)
    f = jax.jit(lambda v, b: sphere.apply(v, b))
    a, b = np.asarray(f(v, b3)), np.asarray(f(v, m3))
    assert np.abs(a - b).max() > 1e-6, (
        "SphereNet's torsion channel no longer sees handedness"
    )
