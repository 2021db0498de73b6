"""Edge-partitioned graph parallelism (model-parallel MolKGNN).

New TPU-first design (nothing to port — SURVEY §2.3): when one batched
graph's kernel-scoring work exceeds a single chip (very large batches or
kernel counts), partition the WORK rows — degree-bucket entries and edges —
across a mesh axis while replicating node features. Each device scores its
shard of neighborhoods and aggregates its shard of edges; per layer, two
``psum``s over ICI reassemble the full score matrix and the full aggregated
node features (hooks: MolGCN/KernelSetConv ``psum_axis``).

Cost model: collectives move [N, sum(L)] activations twice per layer over
ICI, while compute per device drops ~linearly in the shard count — the
right trade once per-chip FLOPs, not bytes, bound the step (the data-
parallel path in data_parallel.py remains the default regime for QSAR-size
molecules). Node-sharded halo exchange is the next rung on this ladder.

DEPRECATED (r4): use parallel/halo.py. The halo-exchange partition
supersedes this design on every axis — it trains (halo_train_step, grad-
parity-tested), is a Trainer/CLI path, and moves cut-sized exchanges
instead of psumming [N, sum(L)] activations twice per layer (bytes here
scale with the whole graph, there with the partition boundary). This
module stays only as the readable model-parallel baseline the halo
design is measured against; it is eval-only, not exported from
``molkgnn_tpu.parallel``, no longer part of the driver dry run, and
importing it warns. It will not grow a train step.

Numerical note: results match the single-device forward except where
permutation scores tie EXACTLY (bitwise-equal neighbor features, e.g.
sibling hydrogens at layers >= 1): fp tie-breaking then depends on matmul
tiling, which differs between compilations — the same sensitivity any
batch-shape change has, in the reference as much as here.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Sequence

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from molkgnn_tpu.graphs.batch import BatchSpec, DegreeBucket, GraphBatch

warnings.warn(
    "molkgnn_tpu.parallel.edge_partition is deprecated: the halo-exchange"
    " partition (molkgnn_tpu.parallel.halo) supersedes it — it trains, is"
    " a Trainer/CLI path, and has strictly better communication scaling."
    " This module remains as an eval-only baseline.",
    DeprecationWarning,
    stacklevel=2,
)


def _shard_rows(arrays, mask, n_shards):
    """Split rows (axis 0) into n_shards equal chunks (already padded)."""
    outs = []
    cap = mask.shape[0]
    per = -(-cap // n_shards)
    padded_cap = per * n_shards
    for a in arrays:
        if a.shape[0] != cap:
            raise ValueError("row count mismatch")
        pad = np.zeros((padded_cap - cap,) + a.shape[1:], a.dtype)
        outs.append(
            np.concatenate([a, pad]).reshape((n_shards, per) + a.shape[1:])
        )
    mpad = np.zeros((padded_cap - cap,), bool)
    outs.append(np.concatenate([mask, mpad]).reshape(n_shards, per))
    return outs


def partition_batch(batch: GraphBatch, n_shards: int) -> GraphBatch:
    """Reshape edge and degree-bucket rows to [n_shards, rows/shard, ...];
    node/graph arrays are replicated (tiled on the shard axis)."""
    to_np = lambda a: np.asarray(a)
    rep = lambda a: np.broadcast_to(
        to_np(a)[None], (n_shards,) + to_np(a).shape
    ).copy()

    esrc, edst, eattr, emask = _shard_rows(
        [to_np(batch.edge_src), to_np(batch.edge_dst), to_np(batch.edge_attr)],
        to_np(batch.edge_mask),
        n_shards,
    )

    buckets = []
    for b in batch.buckets():
        focal, nei, ea, mask = _shard_rows(
            [to_np(b.focal_index), to_np(b.nei_index), to_np(b.nei_edge_attr)],
            to_np(b.mask),
            n_shards,
        )
        buckets.append(
            DegreeBucket(
                focal_index=focal, nei_index=nei, nei_edge_attr=ea, mask=mask
            )
        )

    return GraphBatch(
        x=rep(batch.x),
        p=rep(batch.p),
        node_mask=rep(batch.node_mask),
        node_graph_id=rep(batch.node_graph_id),
        edge_src=esrc,
        edge_dst=edst,
        edge_attr=eattr,
        edge_mask=emask,
        deg1=buckets[0],
        deg2=buckets[1],
        deg3=buckets[2],
        deg4=buckets[3],
        y=rep(batch.y),
        graph_mask=rep(batch.graph_mask),
    )


def edge_parallel_forward(model, mesh: Mesh, axis: str = "graph"):
    """Build a jitted forward: (variables, partitioned_batch) -> output.

    ``model`` must be constructed with ``psum_axis == axis`` so its
    per-layer partial results are psum-combined. The partitioned batch
    (from ``partition_batch``) is sharded on its leading axis; variables
    are replicated.
    """

    def per_device(variables, batch):
        local = jax.tree.map(lambda a: a[0], batch)
        return model.apply(variables, local, train=False)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)
