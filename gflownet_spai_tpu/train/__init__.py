"""Training: config, jitted loop, metrics, checkpointing, CLI."""

from .config import TrainConfig
from .loop import (
    MetricsWriter,
    TrainState,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    setup,
    train,
)

__all__ = [
    "TrainConfig", "MetricsWriter", "TrainState", "make_optimizer",
    "make_train_step", "restore_checkpoint", "save_checkpoint", "setup",
    "train",
]
