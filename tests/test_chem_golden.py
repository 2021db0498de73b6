"""Golden-number tests for the native chemistry stack (VERDICT r1 item 5).

Round 1 tested Gasteiger/EState/TPSA/Crippen only for signs and orderings;
these tests pin them to published values:

  * Gasteiger & Marsili 1980 (Tetrahedron 36, 3219), Table of resulting
    total charges for the alkane/fluoromethane series — the same parameter
    set RDKit's ComputeGasteigerCharges implements (reference feature,
    wrapper.py:57-68).
  * Ertl, Rohde & Selzer 2000 (J. Med. Chem. 43, 3714) TPSA fragment sums
    for named drugs/solvents (reference feature via _CalcTPSAContribs,
    wrapper.py:71-100).
  * Wildman & Crippen 1999 (JCICS 39, 868) logP/MR atom-contribution sums
    for molecules whose atom typing is unambiguous (C1/C18/C3/O2/H types).
  * Kier & Hall E-State worked examples (propane, 2-methylbutane) —
    hand-derived exact values from the published formula
    I = ((2/N)^2 dv + 1)/d,  S_i = I_i + sum_j (I_i-I_j)/(d_ij+1)^2,
    matching the classic hydrogen-suppressed textbook numbers.

Plus an rdkit-gated bit-exactness test so the ``backend='rdkit'`` escape
hatch (chem/features.py::featurize_rdkit) is exercised the moment an
rdkit-bearing environment runs the suite (VERDICT r1 weak item 4).
"""

import importlib.util

import numpy as np
import pytest

from molkgnn_tpu.chem.contribs import crippen_contribs, tpsa_contribs
from molkgnn_tpu.chem.estate import estate_indices
from molkgnn_tpu.chem.gasteiger import gasteiger_charges
from molkgnn_tpu.chem.smiles import parse_smiles


def _charges_by_symbol(smiles):
    mol = parse_smiles(smiles, add_hs=True)
    charges, _ = gasteiger_charges(mol)
    out = {}
    for atom, q in zip(mol.atoms, charges):
        out.setdefault(atom.symbol, []).append(float(q))
    return out


# ---------------------------------------------------------------- Gasteiger


def test_gasteiger_methane_matches_1980_paper():
    """CH4: q(C) = -0.078, q(H) = +0.0195 (Gasteiger & Marsili 1980)."""
    q = _charges_by_symbol("C")
    assert abs(q["C"][0] - (-0.078)) < 4e-3, q["C"]
    for qh in q["H"]:
        assert abs(qh - 0.0195) < 1e-3, q["H"]


def test_gasteiger_ethane_matches_1980_paper():
    """C2H6: q(C) = -0.068 per carbon."""
    q = _charges_by_symbol("CC")
    for qc in q["C"]:
        assert abs(qc - (-0.068)) < 4e-3, q["C"]
    np.testing.assert_allclose(q["C"][0], q["C"][1], atol=1e-9)


def test_gasteiger_fluoromethane_matches_1980_paper():
    """CH3F: q(F) ~ -0.253, C strongly positive vs alkane C."""
    q = _charges_by_symbol("CF")
    assert abs(q["F"][0] - (-0.253)) < 1.5e-2, q["F"]
    assert 0.05 < q["C"][0] < 0.12, q["C"]


def test_gasteiger_charge_conservation_golden_set():
    for smiles in ("C", "CC", "CF", "CO", "CN", "c1ccccc1"):
        mol = parse_smiles(smiles, add_hs=True)
        charges, hq = gasteiger_charges(mol)
        assert abs(float(charges.sum() + hq.sum())) < 1e-6, smiles


# --------------------------------------------------------------------- TPSA

# (SMILES, Ertl 2000 fragment-sum TPSA, fragments involved)
TPSA_GOLDEN = [
    ("c1ccccc1", 0.0, "benzene: no N/O"),
    ("Oc1ccccc1", 20.23, "phenol: [OH]"),
    ("Nc1ccccc1", 26.02, "aniline: [NH2]"),
    ("c1ccncc1", 12.89, "pyridine: aromatic [n]"),
    ("CC(=O)O", 37.30, "acetic acid: O= (17.07) + OH (20.23)"),
    ("CCOCC", 9.23, "diethyl ether: -O-"),
    ("CC(C)=O", 17.07, "acetone: O="),
    ("CC(N)=O", 43.09, "acetamide: O= (17.07) + NH2 (26.02)"),
    (
        "CC(=O)Oc1ccccc1C(=O)O",
        63.60,
        "aspirin: COOH (37.30) + ester O= + -O- (17.07 + 9.23)",
    ),
    (
        "CC(=O)Nc1ccc(O)cc1",
        49.33,
        "acetaminophen: OH (20.23) + amide O=,NH (17.07 + 12.03)",
    ),
    (
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
        37.30,
        "ibuprofen: COOH",
    ),
    (
        "CN1CCCC1c1cccnc1",
        16.13,
        "nicotine: pyridine n (12.89) + tertiary amine (3.24)",
    ),
]


@pytest.mark.parametrize("smiles,want,label", TPSA_GOLDEN)
def test_tpsa_matches_ertl_2000(smiles, want, label):
    mol = parse_smiles(smiles, add_hs=True)
    got = float(tpsa_contribs(mol).sum())
    assert abs(got - want) < 0.05, f"{label}: got {got}, want {want}"


# ------------------------------------------------------------------ Crippen

# Sums over Wildman-Crippen 1999 published atom contributions; each case
# uses only unambiguous types:
#   ethane   = 2*C1 + 6*H(C)      logP 2*0.1441 + 6*0.1230  = 1.0262
#              MR   2*2.503 + 6*1.057                       = 11.348
#   benzene  = 6*C18 + 6*H(C)     logP 6*0.1581 + 6*0.1230  = 1.6866
#              MR   6*3.350 + 6*1.057                       = 26.442
#   methanol = C3 + 3*H(C) + O2 + H(O)
#              logP -0.2035 + 0.369 - 0.2893 - 0.2677       = -0.3915
CRIPPEN_GOLDEN = [
    ("CC", 1.0262, 11.348, "ethane"),
    ("c1ccccc1", 1.6866, 26.442, "benzene"),
    ("CO", -0.3915, None, "methanol"),
]


@pytest.mark.parametrize("smiles,logp,mr,label", CRIPPEN_GOLDEN)
def test_crippen_matches_wildman_1999(smiles, logp, mr, label):
    mol = parse_smiles(smiles, add_hs=True)
    logp_c, mr_c = crippen_contribs(mol)
    got_logp = float(logp_c.sum())
    assert abs(got_logp - logp) < 5e-3, f"{label}: logP {got_logp} != {logp}"
    if mr is not None:
        got_mr = float(mr_c.sum())
        assert abs(got_mr - mr) < 5e-2, f"{label}: MR {got_mr} != {mr}"


# ------------------------------------------------------------------- EState

# Hydrogen-suppressed graphs (the classic Kier-Hall setting). Exact values:
# propane: I = (2, 1.5, 2)
#   S1 = 2 + (2-1.5)/4 + 0/9              = 2.125
#   S2 = 1.5 + 2*(1.5-2)/4                = 1.25
# 2-methylbutane CC(C)CC, atoms (C1, C2, C3, C4, C5), I = (2, 4/3, 2, 3/2, 2):
#   S1 = S3 = 2 + (2-4/3)/4 + (2-3/2)/9 + (2-2)/9 + 0     = 2 + 1/6 + 1/18
#   S2 = 4/3 - 2*(2/3)/4 - (1/6)/4 - (2/3)/9
#   S4 = 3/2 + (3/2-4/3)/4 - 2*(1/2)/9 - (1/2)/4
#   S5 = 2 + (2-3/2)/4 + (2-4/3)/9 + 0 + 0
ESTATE_GOLDEN = [
    ("CCC", [2.125, 1.25, 2.125]),
    (
        "CC(C)CC",
        [
            2 + 1 / 6 + 1 / 18,
            4 / 3 - 1 / 3 - 1 / 24 - 2 / 27,
            2 + 1 / 6 + 1 / 18,
            3 / 2 + 1 / 24 - 1 / 9 - 1 / 8,
            2 + 1 / 8 + 2 / 27,
        ],
    ),
]


@pytest.mark.parametrize("smiles,want", ESTATE_GOLDEN)
def test_estate_matches_kier_hall_worked_examples(smiles, want):
    mol = parse_smiles(smiles, add_hs=False)
    got = estate_indices(mol)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
    # Field effects cancel pairwise: sum(S) == sum(I).
    n_heavy = mol.num_atoms
    assert n_heavy == len(want)


# ------------------------------------------------- rdkit-gated bit parity

_HAS_RDKIT = importlib.util.find_spec("rdkit") is not None


PARITY_SMILES = [
    "CCO",
    "CC(=O)O",
    "c1ccccc1",
    "CC(=O)Nc1ccc(O)cc1",
    "CN1CCCC1c1cccnc1",
]


@pytest.mark.skipif(not _HAS_RDKIT, reason="rdkit not installed")
@pytest.mark.parametrize("smiles", PARITY_SMILES)
def test_native_features_match_rdkit_backend(smiles):
    """backend='rdkit' (chem/features.py:131) vs the native stack on the
    heavy-atom rows. Documented tolerance: one-hots/flags exact; real-valued
    descriptor columns (Gasteiger, Crippen, TPSA, ASA, EState) within 5e-3
    absolute / 1e-2 relative."""
    from rdkit import Chem

    from molkgnn_tpu.chem.features import featurize_native, featurize_rdkit

    rdmol = Chem.AddHs(Chem.MolFromSmiles(smiles))
    x_ref, ei_ref, ea_ref = featurize_rdkit(rdmol)

    mol = parse_smiles(smiles, add_hs=True)
    x_nat, ei_nat, ea_nat = featurize_native(mol)

    n_heavy = sum(1 for a in rdmol.GetAtoms() if a.GetAtomicNum() != 1)
    assert x_ref.shape == x_nat.shape
    # Heavy atoms lead in both layouts and follow SMILES order.
    ref_h = x_ref[:n_heavy]
    nat_h = x_nat[:n_heavy]
    # discrete columns: element/degree one-hots, charge, ring, aromatic,
    # valence, mass
    np.testing.assert_allclose(nat_h[:, :21], ref_h[:, :21], atol=1e-4)
    # real-valued descriptor columns
    np.testing.assert_allclose(
        nat_h[:, 21:], ref_h[:, 21:], atol=5e-3, rtol=1e-2
    )
