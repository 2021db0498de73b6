"""Inference / serving path: checkpoint -> compiled predictor.

The reference has no serving story (training scripts only); this is the
framework's production inference surface:

  * one compiled forward per BatchSpec (padding makes every request shape
    identical, so the first call compiles and every later call is pure
    execution);
  * SMILES-in, scores-out convenience (native featurization + embedding);
  * chunked batching for arbitrarily many molecules;
  * sigmoid-probability or raw-logit output (the reference thresholds
    sigmoid(logit) at 0.5 for PPV/accuracy, evaluation.py:90-121).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from molkgnn_tpu.graphs.batch import BatchSpec, batch_graphs
from molkgnn_tpu.graphs.molgraph import MolGraph


def host_pipeline_for_spec(spec):
    """(mol->graph featurizer, collate) for a spec's batch family.

    Lets artifact-only consumers (``molkgnn-screen``) featurize and pack
    molecules for ANY of the five model families from nothing but the
    BatchSpec carried inside the export — the three point-cloud families
    (schnet/dimenet_pp/spherenet) share one PointBatchSpec pipeline, so
    spec-type dispatch is complete."""
    from molkgnn_tpu.chem.features import mol_to_graph
    from molkgnn_tpu.graphs.chiro import (
        ChiroBatchSpec,
        batch_chiro,
        mol_to_chiro_graph,
    )
    from molkgnn_tpu.graphs.geometric import PointBatchSpec, batch_points

    if isinstance(spec, PointBatchSpec):
        return mol_to_graph, batch_points
    if isinstance(spec, ChiroBatchSpec):
        return mol_to_chiro_graph, batch_chiro
    return mol_to_graph, batch_graphs


class Predictor:
    """Wraps a trained GNNModel + params for fixed-shape batched inference."""

    def __init__(
        self,
        model,
        params,
        batch_stats,
        spec: BatchSpec,
        collate=None,
    ):
        self.model = model
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.spec = spec
        self.collate = collate or host_pipeline_for_spec(spec)[1]

        def forward(variables, batch):
            pred, emb = model.apply(variables, batch, train=False)
            return pred, emb

        self._forward = jax.jit(forward)

    @classmethod
    def from_trainer(cls, trainer, tag: str = "last") -> "Predictor":
        ck = trainer._ckpts.get(tag)
        params = (
            jax.tree.map(jnp.asarray, ck["params"])
            if ck is not None
            else trainer.state.params
        )
        stats = (
            jax.tree.map(jnp.asarray, ck["batch_stats"])
            if ck is not None
            else trainer.state.batch_stats
        )
        return cls(
            trainer.model, params, stats, trainer.spec, collate=trainer.collate
        )

    @classmethod
    def from_checkpoint(
        cls, model, path: str, spec: BatchSpec, collate=None
    ) -> "Predictor":
        from molkgnn_tpu.training.checkpoint import load_checkpoint

        ck = load_checkpoint(path)
        return cls(
            model,
            jax.tree.map(jnp.asarray, ck["params"]),
            jax.tree.map(jnp.asarray, ck["batch_stats"]),
            spec,
            collate=collate,
        )

    # ------------------------------------------------------------------
    def predict_graphs(
        self,
        graphs: Sequence[MolGraph],
        probabilities: bool = False,
        return_embeddings: bool = False,
    ):
        b = self.spec.num_graphs
        dev_scores: List = []
        dev_embs: List = []
        masks: List[np.ndarray] = []
        for start in range(0, len(graphs), b):
            chunk = list(graphs[start : start + b])
            batch = self.collate(chunk, self.spec)
            pred, emb = self._forward(self.variables, batch)
            masks.append(np.asarray(batch.graph_mask))
            dev_scores.append(pred)
            if return_embeddings:
                dev_embs.append(emb)
        # Single device->host readback (tunneled-TPU friendliness).
        mask = np.concatenate(masks) if masks else np.zeros((0,), bool)
        scores = (
            [np.asarray(jnp.concatenate(dev_scores))[mask]]
            if dev_scores
            else []
        )
        embs = (
            [np.asarray(jnp.concatenate(dev_embs))[mask]] if dev_embs else []
        )
        out = np.concatenate(scores) if scores else np.zeros((0,))
        if probabilities:
            from molkgnn_tpu.training.metrics import sigmoid

            out = sigmoid(out)
        if return_embeddings:
            return out, np.concatenate(embs) if embs else np.zeros((0, 0))
        return out

    # ------------------------------------------------------------------
    def _device_pipeline(self):
        """(dataset_builder, gather_fn) for this spec's batch family —
        the same spec-type dispatch the Trainer uses (r4: all five
        families are device-resident)."""
        from molkgnn_tpu.graphs.batch import BatchSpec as _KgnnSpec
        from molkgnn_tpu.graphs.chiro import ChiroBatchSpec
        from molkgnn_tpu.graphs.geometric import PointBatchSpec

        if isinstance(self.spec, PointBatchSpec):
            from molkgnn_tpu.graphs.device_points import (
                DevicePointDataset,
                gather_points,
            )

            return (
                lambda graphs: DevicePointDataset.from_graphs(
                    graphs, self.spec
                ),
                gather_points,
            )
        if isinstance(self.spec, ChiroBatchSpec):
            from molkgnn_tpu.graphs.device_chiro import (
                DeviceChiroDataset,
                gather_chiro,
            )

            return DeviceChiroDataset.from_graphs, gather_chiro
        assert isinstance(self.spec, _KgnnSpec), type(self.spec)
        from molkgnn_tpu.graphs.device_pack import (
            DeviceDataset,
            gather_batch,
        )
        from molkgnn_tpu.graphs.packed import PackedGraphs

        return (
            lambda graphs: DeviceDataset.from_packed(
                PackedGraphs.from_graphs(graphs)
            ),
            gather_batch,
        )

    def _batch_resource_counts(self, graphs):
        """Per-graph resource counts + the spec's capacity vector for this
        batch family — the host-side overflow check the on-device gather
        cannot do (device_pack.py contract: 'the host sampler is
        responsible for honoring the spec')."""
        from molkgnn_tpu.graphs.chiro import ChiroBatchSpec
        from molkgnn_tpu.graphs.geometric import (
            PointBatchSpec,
            molecule_geometry,
        )

        spec = self.spec
        if isinstance(spec, PointBatchSpec):
            rows = []
            for g in graphs:
                e, t, q = molecule_geometry(
                    g, spec.cutoff, spec.with_triplets, spec.with_torsion
                )
                rows.append(
                    (g.num_nodes, e.shape[1], t.shape[1], q.shape[1])
                )
            caps = (
                spec.num_nodes, spec.num_edges, spec.num_triplets,
                spec.num_quads,
            )
            names = ("nodes", "edges", "triplets", "quads")
        elif isinstance(spec, ChiroBatchSpec):
            rows = [
                (
                    g.num_nodes, g.edge_index.shape[1],
                    g.distances.shape[0], g.angles.shape[0],
                    g.dihedrals.shape[0], g.alpha_index.shape[1],
                )
                for g in graphs
            ]
            caps = (
                spec.num_nodes, spec.num_edges, spec.num_dist,
                spec.num_angles, spec.num_dihedrals, spec.num_alpha,
            )
            names = ("nodes", "edges", "dist", "angles", "dihedrals", "alpha")
        else:
            rows = [
                (g.num_nodes, g.num_edges)
                + tuple(g.fields[d].count for d in range(1, 5))
                for g in graphs
            ]
            caps = (spec.num_nodes, spec.num_edges) + tuple(
                spec.deg_capacity
            )
            names = ("nodes", "edges", "deg1", "deg2", "deg3", "deg4")
        return np.asarray(rows, np.int64), np.asarray(caps, np.int64), names

    def screen_library(
        self,
        graphs: Sequence[MolGraph],
        probabilities: bool = False,
        slab: int = 100_000,
        mesh=None,
    ) -> np.ndarray:
        """Virtual-screening scoring of an entire molecule library — the
        reference's actual production use (ranking PubChem HTS libraries
        by score, /root/reference/README.md:4). Device-resident: each slab
        of molecules is flat-packed into HBM ONCE, every padded batch is
        assembled on device, and the whole slab scores in one scanned
        dispatch + one readback — no per-chunk host collation
        (``predict_graphs``'s regime) and no per-batch dispatch.

        Every batch is host-checked against the spec's capacities FIRST
        (the on-device gather silently truncates on overflow — e.g. a
        library molecule larger than anything in the spec's training set);
        an overflowing batch raises like the host packer would. Compiles:
        jit caches by the slab's flat-array shapes, so equal-size slabs of
        a homogeneous library reuse one program; heterogeneous slabs each
        pay a compile (trailing partial slab always does).

        ``mesh``: data-parallel serving — the slab's packed arrays
        replicate into every chip's HBM, the [nblocks, B] id matrix is
        sharded over the mesh's 'data' axis (padded with masked all-(-1)
        blocks to a device multiple), and each chip scores its own
        blocks under ``shard_map``; scores gather back replicated. Same
        numbers as the single-device path (test-enforced), throughput
        scales with the mesh.
        """
        build, gather = self._device_pipeline()
        from molkgnn_tpu.graphs.device_pack import pad_ids

        model, spec = self.model, self.spec
        b = spec.num_graphs

        if mesh is None:
            prog = getattr(self, "_screen_prog", None)
            if prog is None:

                def scan_scores(variables, data, idm):
                    def body(_, ids):
                        pred, _ = model.apply(
                            variables, gather(data, ids, spec), train=False
                        )
                        return None, pred

                    _, preds = jax.lax.scan(body, None, idm)
                    return preds

                prog = self._screen_prog = jax.jit(scan_scores)
            ndev = 1
        else:
            prog = getattr(self, "_screen_prog_dp", None)
            if prog is None or getattr(self, "_screen_mesh", None) is not mesh:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                def per_device(variables, data, idm_local):  # [K, 1, B]
                    def body(_, ids):
                        pred, _ = model.apply(
                            variables, gather(data, ids[0], spec),
                            train=False,
                        )
                        return None, pred

                    _, preds = jax.lax.scan(body, None, idm_local)
                    return preds[:, None]  # [K, 1, B]

                sharded = shard_map(
                    per_device,
                    mesh=mesh,
                    in_specs=(P(), P(), P(None, "data")),
                    out_specs=P(None, "data"),
                    check_vma=False,
                )
                prog = self._screen_prog_dp = jax.jit(sharded)
                self._screen_mesh = mesh
            ndev = int(mesh.shape["data"])

        counts, caps, names = self._batch_resource_counts(graphs)
        outs = []
        for s0 in range(0, len(graphs), slab):
            chunk = list(graphs[s0 : s0 + slab])
            ids = np.arange(len(chunk), dtype=np.int32)
            idm = np.stack(
                [
                    pad_ids(ids[s : s + b], b)
                    for s in range(0, len(chunk), b)
                ]
            )
            if ndev > 1 and idm.shape[0] % ndev:
                # Pad the block axis to a device multiple with fully
                # masked blocks (all -1 ids -> empty padded batches).
                pad_rows = ndev - idm.shape[0] % ndev
                idm = np.concatenate(
                    [idm, np.full((pad_rows, b), -1, np.int32)]
                )
            for row in idm:
                sums = counts[s0 + row[row >= 0]].sum(axis=0)
                if np.any(sums > caps):
                    over = [
                        f"{n}: {int(v)} > cap {int(c)}"
                        for n, v, c in zip(names, sums, caps)
                        if v > c
                    ]
                    raise ValueError(
                        "screen_library: batch exceeds the spec's"
                        f" capacities ({'; '.join(over)}) — the library"
                        " contains molecules larger than the spec was"
                        " built for; rebuild the spec over the library"
                        " (spec_for_graphs / point_spec_for_graphs)"
                    )
            data = build(chunk)
            # The DP program expects [K, ndev, B] whenever it was built
            # (any device count, including a 1-device mesh).
            feed = (
                idm.reshape(idm.shape[0] // ndev, ndev, b)
                if mesh is not None
                else idm
            )
            preds = np.asarray(
                prog(self.variables, data, jnp.asarray(feed))
            ).reshape(-1)
            outs.append(preds[(idm >= 0).reshape(-1)])
        out = np.concatenate(outs) if outs else np.zeros((0,))
        if probabilities:
            from molkgnn_tpu.training.metrics import sigmoid

            out = sigmoid(out)
        return out

    # ------------------------------------------------------------------
    def export(self, path: str) -> None:
        """AOT-export the compiled forward (StableHLO via jax.export) plus
        the parameters: a deployment artifact loadable without the model
        code (`Predictor.load_exported`)."""
        import pickle

        from jax import export as jexport

        from molkgnn_tpu.graphs.batch import GraphBatch

        # jax.export serializes only standard pytrees, so the GraphBatch
        # is flattened to leaves at the boundary (treedef is closed over
        # during tracing; the StableHLO sees plain arrays).
        example = self._zero_batch()
        leaves, treedef = jax.tree_util.tree_flatten(example)
        model = self.model

        def forward(variables, *batch_leaves):
            batch = jax.tree_util.tree_unflatten(treedef, batch_leaves)
            pred, emb = model.apply(variables, batch, train=False)
            return pred, emb

        args_spec = (
            jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                self.variables,
            ),
            *[
                jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
                for a in leaves
            ],
        )
        exported = jexport.export(jax.jit(forward))(*args_spec)
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "stablehlo": exported.serialize(),
                    "variables": jax.tree.map(np.asarray, self.variables),
                    "spec": self.spec,
                },
                f,
            )

    @staticmethod
    def load_exported(path: str):
        """Load an exported artifact; returns (callable(batch)->(pred, emb),
        spec). No model code needed."""
        import pickle

        from jax import export as jexport

        with open(path, "rb") as f:
            payload = pickle.load(f)
        fn = jexport.deserialize(payload["stablehlo"])
        variables = jax.tree.map(jnp.asarray, payload["variables"])

        def call(batch):
            leaves = jax.tree_util.tree_leaves(batch)
            return fn.call(variables, *leaves)

        return call, payload["spec"]

    def _zero_batch(self):
        # Template batch for export tracing — only shapes/dtypes are read
        # (export() traces through ShapeDtypeStructs). The point/chiro
        # packers accept an empty molecule list; the kgnn packer needs one
        # minimal two-atom molecule to materialize every field.
        if not isinstance(self.spec, BatchSpec):
            return self.collate([], self.spec)
        g = MolGraph(
            x=np.zeros((2, self.spec.node_dim), np.float32),
            p=np.zeros((2, self.spec.pos_dim), np.float32),
            edge_index=np.array([[0, 1], [1, 0]], np.int32),
            edge_attr=np.zeros((2, self.spec.edge_dim), np.float32),
        )
        return self.collate([g], self.spec)

    def predict_smiles(
        self,
        smiles: Sequence[str],
        probabilities: bool = False,
        embed_seed: int = 42,
    ) -> np.ndarray:
        """SMILES -> scores; unparseable molecules get NaN (positions are
        preserved)."""
        from molkgnn_tpu.chem.embed import smiles_to_graph

        graphs: List[Optional[MolGraph]] = [
            smiles_to_graph(s, seed=embed_seed) for s in smiles
        ]
        valid = [g for g in graphs if g is not None]
        scores = (
            self.predict_graphs(valid, probabilities=probabilities)
            if valid
            else np.zeros((0,))
        )
        out = np.full(len(smiles), np.nan)
        k = 0
        for i, g in enumerate(graphs):
            if g is not None:
                out[i] = scores[k]
                k += 1
        return out
