from molkgnn_tpu.graphs.molgraph import MolGraph, receptive_fields
from molkgnn_tpu.graphs.batch import (
    GraphBatch,
    DegreeBucket,
    BatchSpec,
    batch_graphs,
    spec_for_graphs,
)

__all__ = [
    "MolGraph",
    "receptive_fields",
    "GraphBatch",
    "DegreeBucket",
    "BatchSpec",
    "batch_graphs",
    "spec_for_graphs",
]
