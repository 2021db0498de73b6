"""Chemistry ingest tests: SDF/SMILES parsing, perception, featurization."""

import numpy as np
import pytest

from molkgnn_tpu.chem.embed import embed_molecule, smiles_to_graph
from molkgnn_tpu.chem.estate import estate_indices
from molkgnn_tpu.chem.features import NODE_DIM, featurize_native, mol_to_graph
from molkgnn_tpu.chem.gasteiger import gasteiger_charges
from molkgnn_tpu.chem.sdf import parse_molblock, parse_sdf
from molkgnn_tpu.chem.smiles import parse_smiles

ETHANOL_MOLBLOCK = """ethanol
  test

  9  8  0  0  0  0  0  0  0  0999 V2000
   -0.8800    0.1700    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    0.4400   -0.5600    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    1.5400    0.3500    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0
   -1.7000   -0.5500    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.9300    0.7900    0.9000 H   0  0  0  0  0  0  0  0  0  0  0  0
   -0.9300    0.7900   -0.9000 H   0  0  0  0  0  0  0  0  0  0  0  0
    0.4900   -1.1900    0.9000 H   0  0  0  0  0  0  0  0  0  0  0  0
    0.4900   -1.1900   -0.9000 H   0  0  0  0  0  0  0  0  0  0  0  0
    2.3600   -0.1400    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  2  3  1  0
  1  4  1  0
  1  5  1  0
  1  6  1  0
  2  7  1  0
  2  8  1  0
  3  9  1  0
M  END
"""


def test_parse_ethanol_molblock():
    mol = parse_molblock(ETHANOL_MOLBLOCK)
    assert mol is not None
    assert mol.num_atoms == 9
    assert len(mol.bonds) == 8
    assert [a.symbol for a in mol.atoms[:3]] == ["C", "C", "O"]
    assert mol.degree(0) == 4 and mol.degree(2) == 2
    assert not any(a.in_ring for a in mol.atoms)


def test_sdf_multi_record_and_fields(tmp_path):
    sdf = ETHANOL_MOLBLOCK + "> <label>\n1\n\n$$$$\n" + ETHANOL_MOLBLOCK + "$$$$\n"
    p = tmp_path / "two.sdf"
    p.write_text(sdf)
    records = list(parse_sdf(str(p)))
    assert len(records) == 2
    mol, data = records[0]
    assert mol is not None and data.get("label") == "1"


def test_parse_malformed_molblock_returns_none():
    assert parse_molblock("garbage\n\n\nnot counts\n") is None


def test_smiles_benzene_aromatic():
    mol = parse_smiles("c1ccccc1", add_hs=True)
    assert mol is not None
    heavy = [a for a in mol.atoms if a.symbol == "C"]
    hs = [a for a in mol.atoms if a.symbol == "H"]
    assert len(heavy) == 6 and len(hs) == 6
    assert all(a.aromatic for a in heavy)
    arom_bonds = [b for b in mol.bonds if b.aromatic]
    assert len(arom_bonds) == 6
    assert all(b.order == 1.5 for b in arom_bonds)
    assert all(a.in_ring for a in heavy)


def test_smiles_rings_branches_charges():
    mol = parse_smiles("CC(=O)[O-]", add_hs=True)  # acetate
    assert mol is not None
    syms = [a.symbol for a in mol.atoms]
    assert syms.count("O") == 2
    charges = [a.charge for a in mol.atoms]
    assert -1 in charges
    # carbonyl double bond present
    assert any(b.order == 2.0 for b in mol.bonds)
    # bad SMILES -> None
    assert parse_smiles("C1CC") is None
    assert parse_smiles("C((C") is None


def test_gasteiger_charges_signs_and_conservation():
    mol = parse_smiles("CCO", add_hs=True)
    q, qh = gasteiger_charges(mol)
    # Neutral molecule: total charge ~ 0 (incl. explicit H atoms).
    assert abs(q.sum()) < 1e-6
    syms = [a.symbol for a in mol.atoms]
    o = syms.index("O")
    assert q[o] < -0.2  # oxygen strongly negative
    # H on oxygen more positive than H on carbon
    o_h = [j for j, _ in mol.neighbors(o) if mol.atoms[j].symbol == "H"][0]
    c_h = [j for j, _ in mol.neighbors(0) if mol.atoms[j].symbol == "H"][0]
    assert q[o_h] > q[c_h] > 0


def test_estate_oxygen_highest_in_ethanol():
    mol = parse_smiles("CCO", add_hs=True)
    es = estate_indices(mol)
    syms = [a.symbol for a in mol.atoms]
    heavy = [i for i, s in enumerate(syms) if s != "H"]
    assert syms[int(max(heavy, key=lambda i: es[i]))] == "O"


def test_featurize_native_shapes_and_onehots():
    mol = parse_molblock(ETHANOL_MOLBLOCK)
    x, edge_index, edge_attr = featurize_native(mol)
    assert x.shape == (9, NODE_DIM)
    assert edge_index.shape == (2, 16)  # both directions
    assert edge_attr.shape == (16, 7)
    # Element one-hot: exactly one flag in [0:12].
    assert np.all(x[:, :12].sum(axis=1) == 1)
    # Degree one-hot: exactly one flag in [12:16].
    assert np.all(x[:, 12:16].sum(axis=1) == 1)
    # Carbon mass.
    c_rows = np.where(x[:, 1] == 1)[0]
    np.testing.assert_allclose(x[c_rows, 20], 12.011)
    # Bond order one-hot single for all ethanol bonds.
    assert np.all(edge_attr[:, 0] == 1)


def test_mol_to_graph_and_receptive_fields():
    mol = parse_molblock(ETHANOL_MOLBLOCK)
    g = mol_to_graph(mol, y=1.0)
    assert g is not None
    g = g.with_fields()
    # C1 has degree 4, O degree 2, Hs degree 1.
    assert g.fields[4].count == 2  # both carbons
    assert g.fields[2].count == 1  # oxygen
    assert g.fields[1].count == 6  # hydrogens
    assert g.fields[3].count == 0


def test_embed_molecule_geometry():
    mol = parse_smiles("C(C)(N)(O)F", add_hs=True)  # chiral-ish center
    pos = embed_molecule(mol, seed=0)
    assert pos.shape == (mol.num_atoms, 3)
    # Bond lengths near covalent-radius sums (0.9 - 2.0 A).
    for b in mol.bonds:
        d = np.linalg.norm(pos[b.a1] - pos[b.a2])
        assert 0.6 < d < 2.2, d
    # Non-planar around the central carbon: tetrahedral volume nonzero.
    nbrs = [j for j, _ in mol.neighbors(0)][:4]
    v = np.abs(
        np.dot(
            pos[nbrs[2]] - pos[0],
            np.cross(pos[nbrs[0]] - pos[0], pos[nbrs[1]] - pos[0]),
        )
    )
    assert v > 0.1


def test_smiles_to_graph_end_to_end():
    g = smiles_to_graph("c1ccccc1O", y=1.0)  # phenol
    assert g is not None
    assert g.x.shape[1] == NODE_DIM
    assert g.num_nodes == 13  # 6 C + O + 6 H
    assert g.with_fields().fields[3].count == 6  # ring carbons deg 3


def test_fused_aromatic_rings_naphthalene():
    mol = parse_smiles("c1ccc2ccccc2c1", add_hs=True)
    assert mol is not None
    carbons = [a for a in mol.atoms if a.symbol == "C"]
    assert len(carbons) == 10
    assert all(a.aromatic for a in carbons)
    # Bridgehead carbons have 3 heavy neighbors and no H.
    bridge = [
        i for i, a in enumerate(mol.atoms)
        if a.symbol == "C"
        and sum(1 for j, _ in mol.neighbors(i) if mol.atoms[j].symbol == "C") == 3
    ]
    assert len(bridge) == 2


def test_kekulized_benzene_perceived_aromatic():
    mol = parse_smiles("C1=CC=CC=C1", add_hs=True)
    heavy = [a for a in mol.atoms if a.symbol == "C"]
    assert all(a.aromatic for a in heavy)
    assert all(
        b.order == 1.5
        for b in mol.bonds
        if mol.atoms[b.a1].symbol == "C" and mol.atoms[b.a2].symbol == "C"
        and b.in_ring
    )


def test_charged_nitrogen_species():
    mol = parse_smiles("C[N+](C)(C)C", add_hs=True)  # tetramethylammonium
    n = [a for a in mol.atoms if a.symbol == "N"][0]
    assert n.charge == 1
    assert mol.total_h(mol.atoms.index(n)) == 0
    mol2 = parse_smiles("[NH4+]", add_hs=True)
    n2 = [a for a in mol2.atoms if a.symbol == "N"][0]
    assert n2.charge == 1
    hs = [a for a in mol2.atoms if a.symbol == "H"]
    assert len(hs) == 4


def test_pyridine_vs_pyrrole_aromaticity():
    pyridine = parse_smiles("c1ccncc1", add_hs=True)
    n_py = [i for i, a in enumerate(pyridine.atoms) if a.symbol == "N"][0]
    assert pyridine.atoms[n_py].aromatic
    pyrrole = parse_smiles("c1cc[nH]c1", add_hs=True)
    n_pyr = [i for i, a in enumerate(pyrrole.atoms) if a.symbol == "N"][0]
    assert pyrrole.atoms[n_pyr].aromatic
    assert pyrrole.total_h(n_pyr) == 1
