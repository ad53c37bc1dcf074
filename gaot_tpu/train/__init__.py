from .base_trainer import BaseTrainer
from .static_trainer import StaticTrainer, masked_mse
from .sequential_trainer import SequentialTrainer
from .schedules import make_optimizer, make_schedule, mix_schedule
from .checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "BaseTrainer",
    "StaticTrainer",
    "SequentialTrainer",
    "masked_mse",
    "make_optimizer",
    "make_schedule",
    "mix_schedule",
    "save_checkpoint",
    "restore_checkpoint",
]
