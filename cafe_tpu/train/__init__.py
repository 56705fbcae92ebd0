from .step import TrainState, build_train_step, build_eval_step, init_state
from .metrics import binary_metrics, roc_auc

__all__ = ["TrainState", "build_train_step", "build_eval_step", "init_state",
           "binary_metrics", "roc_auc"]
