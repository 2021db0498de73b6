"""Segment (scatter/gather) aggregation primitives.

TPU-native replacements for the reference's torch-scatter / PyG
``MessagePassing.propagate`` C++/CUDA ops (/root/reference/models/MolKGNN/
KernelLayer.py:119-123, MolKGNNNet.py:144) built on XLA's sorted/unsorted
segment sums. Indices are static-shape with boolean masks; padded entries
contribute zero. A Pallas CSR SpMM variant was evaluated and retired — it lost
end-to-end to XLA's fused segment-sum (benchmarks/SEGMENT_OPS.json), so these
XLA primitives ARE the hot propagate path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum_nodes(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sum ``values`` [N, F] into ``num_segments`` buckets by ``segment_ids``.

    Padded rows must either carry a False ``mask`` or already be zero.
    """
    if mask is not None:
        values = jnp.where(mask[..., None], values, 0)
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def gather_scatter_add(
    values: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    num_nodes: int,
    edge_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Message passing h'_i = sum_{(j->i) in E} values_j (sum aggregation).

    Mirrors PyG ``propagate(edge_index, sim_sc=...)`` with ``aggr='add'``
    (KernelLayer.py:14, 119-123): gather at edge sources, segment-sum at
    destinations.
    """
    msgs = values[src]
    if edge_mask is not None:
        msgs = jnp.where(edge_mask[..., None], msgs, 0)
    return jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)


def global_add_pool(
    node_values: jnp.ndarray,
    node_graph_id: jnp.ndarray,
    num_graphs: int,
    node_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Node -> graph segment sum (PyG ``global_add_pool``, MolKGNNNet.py:144)."""
    return segment_sum_nodes(
        node_values, node_graph_id, num_graphs, mask=node_mask
    )
