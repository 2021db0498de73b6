"""End-to-end smoke: every model family trains one epoch via the registry."""

import dataclasses

import numpy as np
import pytest

from molkgnn_tpu.chem.embed import embed_molecule
from molkgnn_tpu.chem.smiles import parse_smiles
from molkgnn_tpu.data.dataset import Dataset, QSAR_METRICS
from molkgnn_tpu.graphs.chiro import mol_to_chiro_graph
from molkgnn_tpu.chem.features import mol_to_graph
from molkgnn_tpu.models.registry import GNN_TYPES, get_family
from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

SMILES = [
    "CCO", "CC(=O)O", "c1ccccc1O", "CCN(C)C", "CC(N)C(=O)O", "CCCC",
    "CCOC", "CC(C)O", "CCS", "CCCN", "c1ccccc1C", "CC(C)(C)O",
]

TINY = {
    "kgnn": dict(num_layers=2, kernels_1hop=(2, 3, 4, 5),
                 kernels_nhop=(2, 3, 4, 5), graph_embedding_dim=8),
    "schnet": dict(cutoff=4.0, num_layers=1, hidden_channels=16,
                   num_filters=16, out_channels=8),
    "dimenet_pp": dict(hidden_channels=16, out_channels=8, num_blocks=1,
                       int_emb_size=8, basis_emb_size=4, out_emb_channels=16,
                       num_spherical=3, num_radial=3, cutoff=4.0,
                       num_output_layers=1),
    "spherenet": dict(cutoff=4.0, num_layers=1, hidden_channels=16,
                      out_channels=8, int_emb_size=8, basis_emb_size_dist=4,
                      basis_emb_size_angle=4, basis_emb_size_torsion=4,
                      out_emb_channels=16, num_spherical=3, num_radial=3,
                      num_output_layers=1),
    "chironet": dict(f_h=16, f_h_econv=16, econv_mlp_hidden=(8,),
                     gat_hidden=(16,), gat_heads=2, hidden_d=(8,),
                     hidden_phi=(8,), hidden_c=(8,), hidden_shift=(8,),
                     hidden_alpha=(8,), f_z=(4, 4, 4)),
}

SPEC_KW = {
    "schnet": dict(cutoff=4.0),
    "dimenet_pp": dict(cutoff=4.0),
    "spherenet": dict(cutoff=4.0),
}


def _graphs(gnn_type):
    out = []
    for i, smi in enumerate(SMILES):
        m = parse_smiles(smi, add_hs=True)
        pos = embed_molecule(m, seed=i, iterations=60)
        for k, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[k])
        y = float(i % 2)
        if gnn_type == "chironet":
            g = mol_to_chiro_graph(m, y=y, idx=i, smiles=smi)
        else:
            g = mol_to_graph(m, y=y, idx=i, smiles=smi)
        assert g is not None
        out.append(g)
    return out


@pytest.mark.parametrize("gnn_type", GNN_TYPES)
def test_family_trains_one_epoch(gnn_type, tmp_path):
    fam = get_family(gnn_type)
    graphs = _graphs(gnn_type)
    ds = Dataset(
        name=f"smoke-{gnn_type}",
        graphs=graphs,
        split={
            "train": np.arange(8),
            "valid": np.arange(8, 10),
            "test": np.arange(10, 12),
        },
        metrics=list(QSAR_METRICS),
        loss_name="bce_with_logits",
    )
    spec = fam.make_spec(graphs, batch_size=4, **SPEC_KW.get(gnn_type, {}))
    encoder = fam.make_encoder(**TINY[gnn_type])
    model = GNNModel(encoder=encoder, ffn_dropout_rate=0.0)
    cfg = TrainConfig(
        batch_size=4, max_epochs=1, warmup_iterations=2, oversample=False,
        progress=False, log_dir=str(tmp_path / "logs"),
    )
    trainer = Trainer(model, ds, spec, cfg, collate=fam.collate)
    history = trainer.fit()
    assert np.isfinite(history[0]["train_loss"])
    results = trainer.test()
    assert "last" in results


def test_unknown_family_raises():
    with pytest.raises(ValueError):
        get_family("transformer")
