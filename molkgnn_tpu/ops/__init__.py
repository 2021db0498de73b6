from molkgnn_tpu.ops.permutations import PERMS, num_perms, perm_table
from molkgnn_tpu.ops.similarity import (
    cosine_matrix,
    normalize_rows,
    neighborhood_similarity,
)
from molkgnn_tpu.ops.segment import (
    segment_sum_nodes,
    gather_scatter_add,
    global_add_pool,
)
from molkgnn_tpu.ops.norm import MaskedBatchNorm

__all__ = [
    "PERMS",
    "num_perms",
    "perm_table",
    "cosine_matrix",
    "normalize_rows",
    "neighborhood_similarity",
    "segment_sum_nodes",
    "gather_scatter_add",
    "global_add_pool",
    "MaskedBatchNorm",
]
