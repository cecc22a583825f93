"""Super-resolution heads (reference training/superresolution.py).

EG3D's hybrid SR: bilinear resize to the module's input resolution, then two
StyleGAN2 synthesis blocks conditioned on the last w.  OFF in every shipped
SHERF config (--use_sr_module False) but part of the API surface; the
variants (2X/4X/8X/8XDC) are selected by output resolution like
train.py:316-325.

Note: in the reference, the SHERF decoder emits only 3 channels while the SR
module is constructed with channels=32 (triplane.py:60-62), so the reference
SR path would crash if enabled; here ``channels`` is an explicit attribute
and the generator wires the actual rendered channel count.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sherf_tpu.features.stylegan2 import SynthesisLayer, ToRGBLayer


def resize_bilinear(x: jnp.ndarray, size: int, antialias: bool = True):
    """(B, H, W, C) -> (B, size, size, C), torch bilinear align_corners=False."""
    return jax.image.resize(x, (x.shape[0], size, size, x.shape[-1]),
                            method="linear", antialias=antialias)


class SRSynthesisBlock(nn.Module):
    """SynthesisBlock variant for SR: optional upsampling; with no_up the
    skip image is NOT upsampled (reference SynthesisBlockNoUp:158-255)."""

    out_channels: int
    resolution: int
    up: bool = True
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, img, ws, noise_mode: str = "random",
                 fused_modconv: bool = True):
        w_iter = iter([ws[:, i] for i in range(ws.shape[1])])
        x = SynthesisLayer(self.out_channels, 512, self.resolution,
                           up=2 if self.up else 1, conv_clamp=self.conv_clamp,
                           name="conv0")(x, next(w_iter), noise_mode=noise_mode,
                                         fused_modconv=fused_modconv)
        x = SynthesisLayer(self.out_channels, 512, self.resolution,
                           conv_clamp=self.conv_clamp,
                           name="conv1")(x, next(w_iter), noise_mode=noise_mode,
                                         fused_modconv=fused_modconv)
        if img is not None and self.up:
            from sherf_tpu.kernels.filters import upsample2d, setup_filter

            img = upsample2d(img, setup_filter([1, 3, 3, 1]))
        y = ToRGBLayer(3, 512, conv_clamp=self.conv_clamp,
                       name="torgb")(x, next(w_iter), fused_modconv=fused_modconv)
        img = img + y if img is not None else y
        return x, img


class SuperresolutionHybrid(nn.Module):
    """Generic 2-block hybrid SR head; variants map as:
      128 -> SuperresolutionHybrid2X  (input 64,  no_up first block)
      256 -> SuperresolutionHybrid4X  (input 128, no_up first block)
      512 -> SuperresolutionHybrid8X / 8XDC (input 128, both blocks up)
    """

    img_resolution: int = 512
    channels: int = 32
    deep_channels: bool = True  # 8XDC uses 256/128 blocks vs 8X's 128/64
    sr_antialias: bool = True

    @nn.compact
    def __call__(self, rgb, x, ws, noise_mode: str = "none",
                 fused_modconv: bool = True):
        """rgb: (B, h, w, 3); x: (B, h, w, C) feature image; ws: (B, num_ws, 512).
        Returns (B, img_resolution, img_resolution, 3)."""
        ws = jnp.tile(ws[:, -1:, :], (1, 3, 1))
        if self.img_resolution == 512:
            input_res, up0 = 128, True
            ch0, ch1 = (256, 128) if self.deep_channels else (128, 64)
            res0, res1 = 256, 512
        elif self.img_resolution == 256:
            input_res, up0 = 128, False
            ch0, ch1, res0, res1 = 128, 64, 128, 256
        elif self.img_resolution == 128:
            input_res, up0 = 64, False
            ch0, ch1, res0, res1 = 128, 64, 64, 128
        else:
            raise ValueError(f"unsupported SR resolution {self.img_resolution}")

        if x.shape[1] != input_res:
            x = resize_bilinear(x, input_res, self.sr_antialias)
            rgb = resize_bilinear(rgb, input_res, self.sr_antialias)

        x, rgb = SRSynthesisBlock(ch0, res0, up=up0, name="block0")(
            x, rgb, ws, noise_mode=noise_mode, fused_modconv=fused_modconv)
        x, rgb = SRSynthesisBlock(ch1, res1, up=True, name="block1")(
            x, rgb, ws, noise_mode=noise_mode, fused_modconv=fused_modconv)
        return rgb
