from molkgnn_tpu.serving.predictor import Predictor

__all__ = ["Predictor"]
