from molkgnn_tpu.experiments.sweep import SweepConfig, run_sweep
from molkgnn_tpu.experiments.aggregate import aggregate_results

__all__ = ["SweepConfig", "run_sweep", "aggregate_results"]
