"""Training harness: losses, jitted sharded train/eval steps, loops."""

from .losses import Batch, LossFlags, compute_losses
from .trainer import Trainer, TrainState
from .evaluator import evaluate, test_step_metrics

__all__ = ["Batch", "LossFlags", "compute_losses", "Trainer", "TrainState",
           "evaluate", "test_step_metrics"]
