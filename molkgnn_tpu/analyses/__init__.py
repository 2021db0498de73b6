from molkgnn_tpu.analyses.kernel_reader import decode_kernels, interpret_kernel
from molkgnn_tpu.analyses.embedding_compare import compare_embeddings

__all__ = ["decode_kernels", "interpret_kernel", "compare_embeddings"]
