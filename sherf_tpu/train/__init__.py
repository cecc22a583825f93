from sherf_tpu.train.ssim import ssim
from sherf_tpu.train.loss import reconstruction_loss, img2mse, mse2psnr
from sherf_tpu.train.train_state import (
    SHERFTrainState, create_train_state, ema_update, step_lr_schedule,
)
from sherf_tpu.train.step import make_train_step

__all__ = [
    "ssim",
    "reconstruction_loss",
    "img2mse",
    "mse2psnr",
    "SHERFTrainState",
    "create_train_state",
    "ema_update",
    "step_lr_schedule",
    "make_train_step",
]
