from .loop import Trainer
from .state import TrainState, create_train_state, param_count
from .checkpoint import CheckpointManager, restore_from_path
from .logging import MetricLogger, read_history
from . import metrics, optimizer, schedules, step

__all__ = [
    "Trainer",
    "TrainState",
    "create_train_state",
    "param_count",
    "CheckpointManager",
    "restore_from_path",
    "MetricLogger",
    "read_history",
    "metrics",
    "optimizer",
    "schedules",
    "step",
]
