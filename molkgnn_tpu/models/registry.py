"""Model registry: gnn_type -> encoder + batching strategy.

The reference dispatches on a ``gnn_type`` string in three places (model.py
:31-146, wrapper.py:416-421, data.py:19-22); here the registry is the single
source of truth. Each entry provides the encoder constructor with the
reference's default hyperparameters, the batch-spec builder, and the collate
function matching that model family's featurization.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

GNN_TYPES = ("kgnn", "schnet", "dimenet_pp", "spherenet", "chironet")


@dataclasses.dataclass
class ModelFamily:
    name: str
    make_encoder: Callable[..., Any]
    make_spec: Callable[..., Any]  # (graphs, batch_size, **kw) -> spec
    collate: Callable[..., Any]  # (graphs, spec) -> batch
    out_dim_field: str  # encoder attr holding the graph-embedding dim


def _kgnn() -> ModelFamily:
    from molkgnn_tpu.graphs.batch import batch_graphs, spec_for_graphs
    from molkgnn_tpu.models.kgnn import MolKGNNNet

    return ModelFamily(
        name="kgnn",
        make_encoder=MolKGNNNet,
        make_spec=spec_for_graphs,
        collate=batch_graphs,
        out_dim_field="graph_embedding_dim",
    )


def _schnet() -> ModelFamily:
    from molkgnn_tpu.graphs.geometric import batch_points, point_spec_for_graphs
    from molkgnn_tpu.models.schnet import SchNet

    def make_spec(graphs, batch_size, cutoff=10.0, **kw):
        return point_spec_for_graphs(graphs, batch_size, cutoff=cutoff, **kw)

    return ModelFamily(
        name="schnet",
        make_encoder=SchNet,
        make_spec=make_spec,
        collate=batch_points,
        out_dim_field="out_channels",
    )


def _dimenet_pp() -> ModelFamily:
    from molkgnn_tpu.graphs.geometric import batch_points, point_spec_for_graphs
    from molkgnn_tpu.models.dimenetpp import DimeNetPP

    def make_spec(graphs, batch_size, cutoff=5.0, **kw):
        return point_spec_for_graphs(
            graphs, batch_size, cutoff=cutoff, with_triplets=True, **kw
        )

    return ModelFamily(
        name="dimenet_pp",
        make_encoder=DimeNetPP,
        make_spec=make_spec,
        collate=batch_points,
        out_dim_field="out_channels",
    )


def _spherenet() -> ModelFamily:
    from molkgnn_tpu.graphs.geometric import batch_points, point_spec_for_graphs
    from molkgnn_tpu.models.spherenet import SphereNet

    def make_spec(graphs, batch_size, cutoff=5.0, **kw):
        return point_spec_for_graphs(
            graphs, batch_size, cutoff=cutoff, with_torsion=True, **kw
        )

    return ModelFamily(
        name="spherenet",
        make_encoder=SphereNet,
        make_spec=make_spec,
        collate=batch_points,
        out_dim_field="out_channels",
    )


def _chironet() -> ModelFamily:
    from molkgnn_tpu.graphs.chiro import batch_chiro, chiro_spec_for_graphs
    from molkgnn_tpu.models.chironet import ChIRoNet

    return ModelFamily(
        name="chironet",
        make_encoder=ChIRoNet,
        make_spec=chiro_spec_for_graphs,
        collate=batch_chiro,
        out_dim_field="f_h",
    )


_FACTORIES: Dict[str, Callable[[], ModelFamily]] = {
    "kgnn": _kgnn,
    "schnet": _schnet,
    "dimenet_pp": _dimenet_pp,
    "spherenet": _spherenet,
    "chironet": _chironet,
}


def get_family(gnn_type: str) -> ModelFamily:
    if gnn_type not in _FACTORIES:
        raise ValueError(
            f"unknown gnn_type {gnn_type!r}; expected one of {GNN_TYPES}"
        )
    return _FACTORIES[gnn_type]()
