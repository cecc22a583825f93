"""Reconstruction loss stack (reference StyleGAN2Loss with the GAN terms
stubbed to zero — the effective objective at loss.py:150-165):

  100 * MSE(masked raw rgb) + 10 * MSE(accumulated weights vs fg mask)
  + (1 - SSIM) + LPIPS

Differences by design: the SSIM/LPIPS person crop is mask-weighted on-device
instead of a per-step cv2.boundingRect host sync (loss.py:156 — a known
inefficiency the survey flags), keeping the whole step compiled.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from sherf_tpu.core.config import TrainConfig
from sherf_tpu.core.types import SHERFBatch
from sherf_tpu.train.ssim import ssim


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def reconstruction_loss(out: Dict, batch: SHERFBatch, tcfg: TrainConfig,
                        lpips_fn=None) -> Tuple[jnp.ndarray, Dict]:
    """out: generator output dict; returns (scalar loss, metrics dict)."""
    B, H, W, _ = out["image_raw"].shape
    pred = out["image_raw"] / 2.0 + 0.5          # back to [0, 1] (loss.py:150)
    gt = batch.img
    mask = batch.mask_at_box.reshape(B, H, W).astype(pred.dtype)
    fg = batch.bkgd_msk.reshape(B, H, W)
    fg = (fg != 0).astype(pred.dtype)            # int8 cast quirk (loss.py:151)

    denom = jnp.maximum(mask.sum(), 1.0)
    img_loss = jnp.sum(((pred - gt) ** 2) * mask[..., None]) / (denom * 3.0)
    acc_loss = jnp.sum(((out["weights_image"].reshape(B, H, W) - fg) ** 2) * mask) / denom

    ssim_val = ssim(pred, gt, data_range=1.0, mask=mask)  # (B,)
    ssim_loss = jnp.mean(1.0 - ssim_val)

    lpips_loss = jnp.asarray(0.0, pred.dtype)
    if lpips_fn is not None:
        # LPIPS expects inputs in [-1, 1]; mask the background like the crop does
        m = mask[..., None]
        lpips_loss = jnp.mean(lpips_fn(out["image_raw"] * m,
                                       (gt * 2.0 - 1.0) * m))

    total = (tcfg.w_img * img_loss + tcfg.w_acc * acc_loss
             + tcfg.w_ssim * ssim_loss + tcfg.w_lpips * lpips_loss)
    metrics = {
        "loss": total,
        "img_loss": img_loss,
        "acc_loss": acc_loss,
        "ssim": jnp.mean(ssim_val),
        "lpips": lpips_loss,
        "psnr": mse2psnr(img_loss),
    }
    return total, metrics
