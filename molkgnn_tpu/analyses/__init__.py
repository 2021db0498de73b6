from molkgnn_tpu.analyses.kernel_reader import decode_kernels, interpret_kernel
from molkgnn_tpu.analyses.embedding_compare import compare_embeddings
from molkgnn_tpu.analyses.fixed_kernels import (
    capture_layer0_scores,
    dump_scores,
    load_customized_kernels,
    save_customized_kernels,
)

__all__ = [
    "decode_kernels",
    "interpret_kernel",
    "compare_embeddings",
    "capture_layer0_scores",
    "dump_scores",
    "load_customized_kernels",
    "save_customized_kernels",
]
