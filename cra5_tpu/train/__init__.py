from .calibrate import calibrate_entropy, calibrate_entropy_cached
from .loss import RateDistortionLoss, rate_distortion_loss, kl_weighted_loss
from .checkpoints import (
    save_variables,
    load_variables,
    save_train_state,
    load_train_state,
)
from .optim import make_net_aux_optimizers, split_net_aux_params
from .schedulers import build_schedule
from .ema import EmaState, ema_init, ema_update
from .loop import Trainer, TrainerConfig, TrainState, make_train_step

__all__ = [
    "calibrate_entropy",
    "calibrate_entropy_cached",
    "Trainer",
    "TrainerConfig",
    "TrainState",
    "make_train_step",
    "RateDistortionLoss",
    "rate_distortion_loss",
    "kl_weighted_loss",
    "save_variables",
    "load_variables",
    "save_train_state",
    "load_train_state",
    "make_net_aux_optimizers",
    "split_net_aux_params",
    "build_schedule",
    "EmaState",
    "ema_init",
    "ema_update",
]
