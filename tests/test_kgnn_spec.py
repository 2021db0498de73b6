"""Parity of the vectorized TPU KernelConv against the numpy spec oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molkgnn_tpu.models.kgnn import KernelConv
from tests.spec_kgnn import kernel_conv_spec

F, E = 28, 7


def make_inputs(rng, m, deg, chiral_dups=False):
    x_focal = rng.standard_normal((m, F)).astype(np.float32)
    p_focal = rng.standard_normal((m, 3)).astype(np.float32)
    x_nei = rng.standard_normal((m, deg, F)).astype(np.float32)
    if chiral_dups and deg == 4:
        # Make half the nodes achiral by duplicating two neighbor features.
        for i in range(0, m, 2):
            x_nei[i, 3] = x_nei[i, 1]
    p_nei = rng.standard_normal((m, deg, 3)).astype(np.float32)
    e_nei = rng.standard_normal((m, deg, E)).astype(np.float32)
    return x_focal, p_focal, x_nei, p_nei, e_nei


def run_both(deg, m=9, num_kernels=5, is_last_layer=False, chiral_dups=False, seed=0):
    rng = np.random.default_rng(seed)
    inputs = make_inputs(rng, m, deg, chiral_dups)
    conv = KernelConv(
        deg=deg, num_kernels=num_kernels, node_dim=F, edge_dim=E
    )
    mask = np.ones((m,), bool)
    params = conv.init(
        jax.random.key(seed), *map(jnp.asarray, inputs), mask, is_last_layer
    )
    got = np.asarray(
        conv.apply(params, *map(jnp.asarray, inputs), mask, is_last_layer)
    )
    spec_params = {
        k: np.asarray(v) for k, v in params["params"].items()
    }
    want = kernel_conv_spec(
        spec_params, *inputs, deg=deg, is_last_layer=is_last_layer
    )
    return got, want


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
def test_kernelconv_matches_spec(deg):
    got, want = run_both(deg, seed=deg)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_fixed_kernelconv_matches_spec_and_freezes():
    """A frozen KernelConv (init_kernel + trainable_kernels=False,
    reference kernels.py:14-72 ``requires_grad=False``) must score exactly
    like the spec oracle with the SUPPLIED tensors, and expose only the
    score weights as parameters."""
    deg, m, L = 3, 7, 4
    rng = np.random.default_rng(11)
    inputs = make_inputs(rng, m, deg)
    init_kernel = {
        "x_center": rng.standard_normal((L, F)).astype(np.float32),
        "x_support": rng.standard_normal((L, deg, F)).astype(np.float32),
        "edge_attr_support": rng.standard_normal((L, deg, E)).astype(
            np.float32
        ),
        "p_support": rng.standard_normal((L, deg, 3)).astype(np.float32),
    }
    conv = KernelConv(
        deg=deg, num_kernels=L, node_dim=F, edge_dim=E,
        init_kernel=init_kernel, trainable_kernels=False,
    )
    mask = np.ones((m,), bool)
    params = conv.init(
        jax.random.key(0), *map(jnp.asarray, inputs), mask, False
    )
    assert set(params["params"]) == {
        "length_sc_weight", "angle_sc_weight", "center_attr_sc_weight",
        "support_attr_sc_weight", "edge_attr_support_sc_weight",
    }
    got = np.asarray(
        conv.apply(params, *map(jnp.asarray, inputs), mask, False)
    )
    spec_params = dict(init_kernel)
    spec_params.update({k: np.asarray(v) for k, v in params["params"].items()})
    want = kernel_conv_spec(spec_params, *inputs, deg=deg, is_last_layer=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    # Trainable variant with the same init must score identically while
    # exposing the kernel tensors as parameters.
    conv_t = KernelConv(
        deg=deg, num_kernels=L, node_dim=F, edge_dim=E,
        init_kernel=init_kernel, trainable_kernels=True,
    )
    params_t = conv_t.init(
        jax.random.key(1), *map(jnp.asarray, inputs), mask, False
    )
    assert "x_center" in params_t["params"]
    got_t = np.asarray(
        conv_t.apply(params_t, *map(jnp.asarray, inputs), mask, False)
    )
    np.testing.assert_array_equal(got, got_t)


def test_fixed_kernel_set_block_order():
    """KernelSetConv with a fixed set: the degree's columns are
    [fixed; trainable] (reference kernels.py:536-545) and block_widths
    reports the combined widths."""
    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs import batch_graphs, spec_for_graphs
    from molkgnn_tpu.models.kgnn import KernelSetConv

    ds = make_synthetic_dataset(seed=5, num_graphs=8)
    spec = spec_for_graphs(ds.graphs, batch_size=8)
    batch = batch_graphs(ds.graphs, spec)
    rng = np.random.default_rng(2)
    fixed2 = {
        "x_center": rng.standard_normal((3, F)).astype(np.float32),
        "x_support": rng.standard_normal((3, 2, F)).astype(np.float32),
        "edge_attr_support": rng.standard_normal((3, 2, E)).astype(np.float32),
        "p_support": rng.standard_normal((3, 2, 3)).astype(np.float32),
    }
    fixed = (None, fixed2, None, None)
    layer = KernelSetConv(
        num_kernels=(2, 2, 2, 2), node_dim=F, edge_dim=E, fixed_kernels=fixed
    )
    assert layer.block_widths() == (2, 5, 2, 2)
    params = layer.init(jax.random.key(0), batch.x, batch.p, batch.buckets())
    out = np.asarray(
        layer.apply(params, batch.x, batch.p, batch.buckets())
    )
    assert out.shape[1] == 11
    # Degree-2 block: columns 2..4 are the fixed kernels' scores — nonzero
    # exactly on degree-2 nodes (same rows as the trainable deg-2 block).
    fixed_block, train_block = out[:, 2:5], out[:, 5:7]
    assert (np.any(fixed_block != 0, 1) == np.any(train_block != 0, 1)).all()
    assert np.any(fixed_block != 0)

    # No fixed set => identical trainable scoring (trainable params are
    # initialized under the same names/keys).
    plain = KernelSetConv(num_kernels=(2, 2, 2, 2), node_dim=F, edge_dim=E)
    out_plain = np.asarray(
        plain.apply(params, batch.x, batch.p, batch.buckets())
    )
    np.testing.assert_array_equal(
        np.delete(out, [2, 3, 4], axis=1), out_plain
    )


def test_kernelconv_chirality_last_layer():
    got, want = run_both(4, is_last_layer=True, chiral_dups=True, seed=7)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    # The sign logic must actually fire for some (node, kernel).
    got_nolast, _ = run_both(4, is_last_layer=False, chiral_dups=True, seed=7)
    assert not np.allclose(got, got_nolast)


def test_chirality_flips_on_mirror():
    """Mirroring neighbor geometry flips the sign of chiral scores."""
    rng = np.random.default_rng(11)
    m, L = 6, 4
    x_focal, p_focal, x_nei, p_nei, e_nei = make_inputs(rng, m, 4)
    conv = KernelConv(deg=4, num_kernels=L, node_dim=F, edge_dim=E)
    mask = np.ones((m,), bool)
    args = (x_focal, p_focal, x_nei, p_nei, e_nei, mask, True)
    params = conv.init(jax.random.key(0), *args)
    sc = np.asarray(conv.apply(params, *args))
    mirrored = (x_focal, -p_focal, x_nei, -p_nei, e_nei, mask, True)
    sc_m = np.asarray(conv.apply(params, *mirrored))
    # Mirror negates the neighborhood determinant => every chiral
    # (node, kernel) score flips sign; all inputs here are chiral
    # (random features are pairwise distinct almost surely).
    np.testing.assert_allclose(np.abs(sc), np.abs(sc_m), rtol=1e-5)
    assert not np.allclose(sc, sc_m)


def test_masked_rows_zero():
    rng = np.random.default_rng(3)
    inputs = make_inputs(rng, 8, 3)
    conv = KernelConv(deg=3, num_kernels=4, node_dim=F, edge_dim=E)
    mask = np.array([True] * 4 + [False] * 4)
    params = conv.init(jax.random.key(0), *inputs, mask, False)
    out = np.asarray(conv.apply(params, *inputs, mask, False))
    assert np.all(out[4:] == 0)
    assert np.all(out[:4] != 0)


def test_bf16_matmul_close_to_fp32():
    """matmul_dtype='bfloat16' scores stay within bf16 rounding of fp32."""
    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.models.kgnn import MolKGNNNet

    ds = make_synthetic_dataset(seed=6, num_graphs=8)
    spec = spec_for_graphs(ds.graphs, batch_size=4)
    batch = next(iter(GraphLoader(ds.graphs[:4], spec, 4)))
    m32 = MolKGNNNet(num_layers=2, kernels_1hop=(2, 3, 4, 5),
                     kernels_nhop=(2, 3, 4, 5), graph_embedding_dim=8)
    mbf = MolKGNNNet(num_layers=2, kernels_1hop=(2, 3, 4, 5),
                     kernels_nhop=(2, 3, 4, 5), graph_embedding_dim=8,
                     matmul_dtype="bfloat16")
    v = m32.init(jax.random.key(0), batch)
    out32 = np.asarray(m32.apply(v, batch))
    outbf = np.asarray(mbf.apply(v, batch))
    # bf16 has ~3 decimal digits; scores are O(1) pre-pooling, sums O(10).
    np.testing.assert_allclose(outbf, out32, rtol=0.05, atol=0.15)
