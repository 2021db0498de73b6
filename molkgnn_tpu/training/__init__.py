from molkgnn_tpu.training.metrics import (
    calculate_logAUC,
    calculate_auc,
    calculate_ppv,
    calculate_accuracy,
    calculate_f1_score,
    compute_metrics,
)
from molkgnn_tpu.training.schedule import polynomial_warmup_decay
from molkgnn_tpu.training.optim import make_optimizer
from molkgnn_tpu.training.model import GNNModel
from molkgnn_tpu.training.trainer import Trainer, TrainConfig
from molkgnn_tpu.training.checkpoint import (
    from_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "calculate_logAUC",
    "calculate_auc",
    "calculate_ppv",
    "calculate_accuracy",
    "calculate_f1_score",
    "compute_metrics",
    "polynomial_warmup_decay",
    "make_optimizer",
    "GNNModel",
    "Trainer",
    "TrainConfig",
    "from_torch_state_dict",
    "load_torch_checkpoint",
]
