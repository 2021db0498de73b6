from molkgnn_tpu.data.synthetic import random_molgraph, random_dataset

__all__ = ["random_molgraph", "random_dataset"]
