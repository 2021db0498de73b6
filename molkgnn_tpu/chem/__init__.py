"""Host-side chemistry ingest: parsers, perception, featurization.

The reference delegates all chemistry to RDKit (C++ underneath,
/root/reference/wrapper.py:5-17). This package provides a native
implementation of everything the featurization contract needs — SDF/SMILES
parsing, ring/aromaticity perception, Gasteiger (PEOE) charges, EState
indices, TPSA / Crippen / Labute-ASA contributions — so the framework runs
with zero non-baked dependencies, plus an optional RDKit backend
(``features.featurize_mol(backend="rdkit")``) for bit-exact parity with the
reference when RDKit is installed.

Everything here runs on the host at ingest time and is cached; nothing is a
device op.
"""

from molkgnn_tpu.chem.sdf import parse_sdf, parse_molblock
from molkgnn_tpu.chem.mol import Molecule, Atom, Bond
from molkgnn_tpu.chem.features import mol_to_graph, NODE_DIM, EDGE_DIM

__all__ = [
    "parse_sdf",
    "parse_molblock",
    "Molecule",
    "Atom",
    "Bond",
    "mol_to_graph",
    "NODE_DIM",
    "EDGE_DIM",
]
