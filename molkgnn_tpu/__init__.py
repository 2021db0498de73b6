"""molkgnn_tpu — a TPU-native (JAX/XLA/Pallas) framework for molecular-kernel
graph neural networks (MolKGNN) and 3D-geometry GNN baselines.

Re-designed from scratch for TPU hardware with the capabilities of the
LanceKnight/MolKGNN reference (AAAI-23): chirality-aware molecular kernel
convolutions for QSAR modeling, plus SchNet / DimeNet++ / SphereNet / ChIRoNet
baselines, trained on highly imbalanced PubChem HTS datasets and evaluated
with virtual-screening metrics (logAUC[0.001,0.1], AUC, PPV, F1).

Design pillars (see ARCHITECTURE.md):
  * Static XLA shapes everywhere: molecules are padded into degree-bucketed,
    batched receptive fields on the host; the device never sees dynamic shapes.
  * The kernel-neighborhood scoring is a dense batched matmul pipeline that
    maps onto the MXU (cosine similarity == normalized matmul).
  * Sparse aggregation (message passing / pooling) uses XLA segment-sum with
    optional Pallas CSR kernels for the hot paths.
  * Multi-chip scaling via jax.sharding Mesh + shard_map (data parallel over
    molecules first; edge partitioning for very large batched graphs).
"""

__version__ = "0.1.0"

from molkgnn_tpu.graphs.batch import GraphBatch, DegreeBucket  # noqa: F401
