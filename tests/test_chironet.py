"""ChIRoNet pipeline tests: featurization, batching, model forward."""

import jax
import numpy as np
import pytest

from molkgnn_tpu.chem.chiro_features import (
    all_paths,
    internal_coordinates,
    local_structure_map,
)
from molkgnn_tpu.chem.embed import embed_molecule
from molkgnn_tpu.chem.smiles import parse_smiles
from molkgnn_tpu.graphs.chiro import (
    batch_chiro,
    chiro_spec_for_graphs,
    mol_to_chiro_graph,
)
from molkgnn_tpu.models.chironet import ChIRoNet

SMILES = ["CCO", "CC(=O)O", "c1ccccc1O", "CCN(C)C", "CC(N)C(=O)O", "CCCC"]


def _mol(smi, seed=0):
    m = parse_smiles(smi, add_hs=True)
    pos = embed_molecule(m, seed=seed, iterations=80)
    for i, a in enumerate(m.atoms):
        a.x, a.y, a.z = map(float, pos[i])
    return m


@pytest.fixture(scope="module")
def chiro_graphs():
    gs = []
    for i, smi in enumerate(SMILES):
        g = mol_to_chiro_graph(_mol(smi, i), y=float(i % 2), idx=i, smiles=smi)
        assert g is not None
        gs.append(g)
    return gs


def test_paths_counts_butane():
    m = _mol("CCCC")  # explicit H: 4 C + 10 H
    d = [p for p in all_paths(m, 1) if p[0] < p[1]]
    assert len(d) == len(m.bonds)  # each bond once
    a = [p for p in all_paths(m, 2) if p[0] < p[2]]
    s = [p for p in all_paths(m, 3) if p[1] < p[2]]
    assert len(s) > 0
    # Central C-C bond carries H-H dihedrals too; every dihedral's middle
    # bond must be a real bond.
    bonds = {frozenset((b.a1, b.a2)) for b in m.bonds}
    for p in s:
        assert frozenset((p[1], p[2])) in bonds


def test_internal_coordinates_values():
    m = _mol("CCO", seed=3)
    out = internal_coordinates(m)
    assert out is not None
    distances, d_idx, angles, a_idx, dihedrals, s_idx = out
    pos = m.positions()
    for n in range(d_idx.shape[0]):
        i, j = d_idx[n]
        np.testing.assert_allclose(
            distances[n], np.linalg.norm(pos[i] - pos[j]), rtol=1e-5
        )
    assert np.all(angles >= 0) and np.all(angles <= np.pi + 1e-6)
    assert np.all(dihedrals > -np.pi - 1e-6) and np.all(dihedrals <= np.pi + 1e-6)


def test_local_structure_map_reference_semantics():
    idx = np.array(
        [[0, 1, 2, 3], [4, 1, 2, 5], [0, 2, 3, 6], [7, 1, 2, 8]], np.int64
    )
    ls, alpha = local_structure_map(idx)
    np.testing.assert_array_equal(ls, [0, 0, 1, 0])
    np.testing.assert_array_equal(alpha, [[1, 2], [2, 3]])


def test_chiro_graph_features(chiro_graphs):
    g = chiro_graphs[0]
    assert g.x.shape[1] == 52
    assert g.edge_attr.shape[1] == 14
    # one-hot groups sum to 1
    assert np.all(g.x[:, :13].sum(1) == 1)  # atom type
    assert np.all(g.x[:, 13:21].sum(1) == 1)  # degree
    # both directions consecutive
    assert np.array_equal(g.edge_index[:, 0], g.edge_index[::-1, 1])


def test_chironet_forward_and_padding(chiro_graphs):
    spec = chiro_spec_for_graphs(chiro_graphs, batch_size=3)
    batch = batch_chiro(chiro_graphs[:3], spec)
    model = ChIRoNet(f_h=16, f_h_econv=16, econv_mlp_hidden=(8,),
                     gat_hidden=(16,), gat_heads=2, hidden_d=(16,),
                     hidden_phi=(16,), hidden_c=(16,), hidden_shift=(16,),
                     hidden_alpha=(16,), f_z=(4, 4, 4))
    v = model.init(jax.random.key(0), batch)
    out = jax.jit(lambda v, b: model.apply(v, b))(v, batch)
    assert out.shape == (3, 16)
    assert np.all(np.isfinite(np.asarray(out)))

    b2 = batch_chiro(chiro_graphs[:2], spec)
    out2 = model.apply(v, b2)
    np.testing.assert_allclose(
        np.asarray(out2[:2]), np.asarray(out[:2]), rtol=1e-4, atol=1e-4
    )


def test_chironet_cmp_path(chiro_graphs):
    spec = chiro_spec_for_graphs(chiro_graphs, batch_size=2)
    batch = batch_chiro(chiro_graphs[:2], spec)
    model = ChIRoNet(f_h=8, f_h_econv=8, econv_mlp_hidden=(8,),
                     gat_hidden=(8,), gat_heads=1, hidden_d=(8,),
                     hidden_phi=(8,), hidden_c=(8,), hidden_shift=(8,),
                     hidden_alpha=(8,), f_z=(4, 4, 4),
                     chiral_message_passing=True, cmp_econv_hidden=(8,),
                     cmp_gat_layers=1, cmp_gat_heads=1)
    v = model.init(jax.random.key(1), batch)
    out = model.apply(v, batch)
    assert np.all(np.isfinite(np.asarray(out)))


def test_device_gather_chiro_equals_host_pack(chiro_graphs):
    """The chironet on-device assembly (graphs/device_chiro.gather_chiro)
    must be BIT-identical to the host packer (chiro.batch_chiro) for the
    same graphs and spec — node-offset rebasing for every index tuple and
    ALPHA-offset rebasing for ls_map."""
    import jax
    import jax.numpy as jnp

    from molkgnn_tpu.graphs.chiro import batch_chiro, chiro_spec_for_graphs
    from molkgnn_tpu.graphs.device_chiro import (
        DeviceChiroDataset,
        gather_chiro,
    )
    from molkgnn_tpu.graphs.device_pack import pad_ids

    spec = chiro_spec_for_graphs(chiro_graphs, batch_size=4)
    dev = DeviceChiroDataset.from_graphs(chiro_graphs)
    for ids in (np.array([5, 1, 3, 2]), np.array([4, 0])):
        want = batch_chiro([chiro_graphs[i] for i in ids], spec)
        got = jax.jit(gather_chiro, static_argnums=2)(
            dev, jnp.asarray(pad_ids(ids, 4)), spec
        )
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(want),
        ):
            assert str(ka) == str(kb)
            assert np.asarray(a).dtype == np.asarray(b).dtype, (
                ka, np.asarray(a).dtype, np.asarray(b).dtype
            )
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=str(ka)
            )


def test_chironet_device_resident_devsample_fit(tmp_path, chiro_graphs):
    """chironet rides the device-resident pipeline too (r4): a fit with
    device_sampling + scan fusion runs with zero per-step host input,
    exact step budget, finite losses, and per-seed determinism."""
    import dataclasses as _dc

    import jax

    from molkgnn_tpu.data.dataset import Dataset, QSAR_METRICS
    from molkgnn_tpu.graphs.device_chiro import DeviceChiroDataset
    from molkgnn_tpu.models.registry import get_family
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    graphs = [
        _dc.replace(g, idx=i, y=float(i % 2))
        for i, g in enumerate(list(chiro_graphs) * 4)  # 24 molecules
    ]
    ds = Dataset(
        name="chiro-devsample",
        graphs=graphs,
        split={
            "train": np.arange(16),
            "valid": np.arange(16, 20),
            "test": np.arange(20, 24),
        },
        metrics=list(QSAR_METRICS),
        loss_name="bce_with_logits",
    )
    fam = get_family("chironet")
    spec = fam.make_spec(graphs, batch_size=4)
    model = GNNModel(
        encoder=fam.make_encoder(
            f_h=16, f_h_econv=16, econv_mlp_hidden=(8,), gat_hidden=(16,),
            gat_heads=2, hidden_d=(8,), hidden_phi=(8,), hidden_c=(8,),
            hidden_shift=(8,), hidden_alpha=(8,), f_z=(8, 8, 8),
            output_mode="both",
        ),
        ffn_dropout_rate=0.0,
    )

    def run(sub):
        cfg = TrainConfig(
            batch_size=4, max_epochs=2, warmup_iterations=3,
            oversample=True, device_sampling=True, scan_steps=2,
            progress=False, log_dir=str(tmp_path / sub), tot_iterations=20,
        )
        t = Trainer(model, ds, spec, cfg, collate=fam.collate)
        assert isinstance(t._device_data, DeviceChiroDataset)
        t.fit()
        return t

    t1 = run("a")
    assert int(np.asarray(t1.state.step)) == 2 * (-(-16 // 4))
    assert all(np.isfinite(h["train_loss"]) for h in t1.history)
    t2 = run("b")
    for a, b in zip(
        jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
