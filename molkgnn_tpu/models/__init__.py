from molkgnn_tpu.models.kgnn import KernelConv, KernelSetConv, MolGCN, MolKGNNNet

__all__ = ["KernelConv", "KernelSetConv", "MolGCN", "MolKGNNNet"]
