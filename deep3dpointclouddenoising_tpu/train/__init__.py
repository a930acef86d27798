"""Training runtime: optimizers, LR schedules, train state, jitted steps."""
from .lr_schedule import get_lr_schedule
from .trainer import Trainer, TrainState, make_optimizer
