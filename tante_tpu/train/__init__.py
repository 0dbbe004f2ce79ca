from tante_tpu.train.metrics import (
    L2RE,
    MSE,
    NMSE,
    NNMSE,
    NRMSE,
    RMSE,
    VMSE,
    VRMSE,
    Metric,
    complexity_metrics,
)
from tante_tpu.train.optimizers import AdamW
from tante_tpu.train.rollout import (
    rollout_adaptive_eval,
    rollout_adaptive_train,
    rollout_fixed,
)
from tante_tpu.train.schedules import LinearWarmupCosineAnnealingLR
from tante_tpu.train.trainer import Trainer
from tante_tpu.train.r_trainer import R_Trainer
from tante_tpu.train.evaler import Evaler
from tante_tpu.train.r_evaler import R_Evaler

__all__ = [
    "Metric",
    "MSE",
    "NMSE",
    "L2RE",
    "NNMSE",
    "RMSE",
    "NRMSE",
    "VMSE",
    "VRMSE",
    "complexity_metrics",
    "AdamW",
    "LinearWarmupCosineAnnealingLR",
    "rollout_fixed",
    "rollout_adaptive_train",
    "rollout_adaptive_eval",
    "Trainer",
    "R_Trainer",
    "Evaler",
    "R_Evaler",
]
