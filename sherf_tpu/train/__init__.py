from sherf_tpu.train.ssim import ssim
from sherf_tpu.train.loss import reconstruction_loss, img2mse, mse2psnr
from sherf_tpu.train.train_state import (
    SHERFTrainState, create_train_state, ema_update, step_lr_schedule,
)
from sherf_tpu.train.step import make_train_step
from sherf_tpu.train.gan import (
    g_adversarial_loss, d_loss, r1_penalty, make_gan_losses, create_d_state,
)

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
    "g_adversarial_loss",
    "d_loss",
    "r1_penalty",
    "make_gan_losses",
    "create_d_state",
]
