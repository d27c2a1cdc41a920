"""Training runtime: optax loops, schedules, checkpoints, experiment driver."""

from .trainer import Trainer, TrainState, build_optimizer, lr_schedule  # noqa: F401
from .checkpoint import CheckpointManager, load_checkpoint  # noqa: F401
