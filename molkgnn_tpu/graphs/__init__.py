from molkgnn_tpu.graphs.molgraph import MolGraph, receptive_fields
from molkgnn_tpu.graphs.batch import (
    GraphBatch,
    DegreeBucket,
    BatchSpec,
    batch_graphs,
    spec_for_graphs,
)
from molkgnn_tpu.graphs.balance import spec_for_dataset, spec_for_sampler

__all__ = [
    "MolGraph",
    "receptive_fields",
    "GraphBatch",
    "DegreeBucket",
    "BatchSpec",
    "batch_graphs",
    "spec_for_graphs",
    "spec_for_sampler",
    "spec_for_dataset",
]
