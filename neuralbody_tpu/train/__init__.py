from . import wrappers  # noqa: F401  (registers trainer plugins)
from .optimizer import make_optimizer, make_lr_schedule
from .step import train_step, eval_step, masked_mse
from .checkpoint import save_checkpoint, load_checkpoint, load_params
from .recorder import Recorder

__all__ = ["make_optimizer", "make_lr_schedule", "train_step", "eval_step",
           "masked_mse", "save_checkpoint", "load_checkpoint", "load_params",
           "Recorder"]
