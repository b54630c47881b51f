from chore_tpu.train.checkpoints import (
    find_checkpoint,
    load_checkpoint,
    save_checkpoint,
    update_val_min,
)
from chore_tpu.train.trainer import MetricsLogger, Trainer, multistep_lr

__all__ = [
    "find_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
    "update_val_min",
    "MetricsLogger",
    "Trainer",
    "multistep_lr",
]
