"""StyleGAN2 discriminator + EG3D dual discriminator.

Ported for API completeness (reference networks_stylegan2.Discriminator:745
and dual_discriminator.DualDiscriminator:107): the shipped SHERF training
stubs the GAN objective to zero (loss.py:162-165), but the D tower, the
minibatch-stddev epilogue, and the dual-channel raw+SR discrimination remain
part of the framework surface and can be enabled via TrainConfig.w_gan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from sherf_tpu.features.stylegan2 import EqualConv2d, EqualDense
from sherf_tpu.features.superresolution import resize_bilinear
from sherf_tpu.kernels.filters import downsample2d, setup_filter

_FILTER = setup_filter([1, 3, 3, 1])


class DiscriminatorBlock(nn.Module):
    """resnet-architecture block (networks_stylegan2.py:566-650)."""

    tmp_channels: int
    out_channels: int
    first: bool = False  # fromrgb input block

    @nn.compact
    def __call__(self, x, img):
        if self.first:
            y = EqualConv2d(self.tmp_channels, 1, activation="lrelu",
                            name="fromrgb")(img)
            x = y if x is None else x + y
        skip = EqualConv2d(self.out_channels, 1, use_bias=False, down=2,
                           name="skip")(x, gain=float(np.sqrt(0.5)))
        x = EqualConv2d(self.tmp_channels, 3, activation="lrelu",
                        name="conv0")(x)
        x = EqualConv2d(self.out_channels, 3, activation="lrelu", down=2,
                        name="conv1")(x, gain=float(np.sqrt(0.5)))
        return skip + x


def minibatch_stddev(x: jnp.ndarray, group_size: Optional[int] = 1,
                     num_channels: int = 1) -> jnp.ndarray:
    """(networks_stylegan2.MinibatchStdLayer:655-679); NHWC."""
    N, H, W, C = x.shape
    G = min(group_size or N, N)
    F = num_channels
    c = C // F
    y = x.reshape(G, -1, H, W, F, c)
    y = y - jnp.mean(y, axis=0)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))          # (n, F)
    y = jnp.tile(y[:, None, None, :], (G, H, W, 1))
    return jnp.concatenate([x, y], axis=-1)


class Discriminator(nn.Module):
    """(networks_stylegan2.Discriminator:745-803), unconditional (SHERF zeroes
    the pose conditioning)."""

    img_resolution: int = 512
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    mbstd_group_size: int = 1  # train.py:285 sets mbstd 1

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        log2 = int(np.log2(self.img_resolution))
        resolutions = [2 ** i for i in range(log2, 2, -1)]
        channels = {res: min(self.channel_base // res, self.channel_max)
                    for res in resolutions + [4]}
        x = None
        for i, res in enumerate(resolutions):
            x = DiscriminatorBlock(channels[res], channels[res // 2],
                                   first=(i == 0), name=f"b{res}")(x, img)
        # epilogue (networks_stylegan2.py:684-740)
        if self.mbstd_group_size:
            x = minibatch_stddev(x, self.mbstd_group_size)
        x = EqualConv2d(channels[4], 3, activation="lrelu", name="conv")(x)
        x = x.reshape(x.shape[0], -1)
        x = EqualDense(channels[4], activation="lrelu", name="fc")(x)
        return EqualDense(1, name="out")(x)


class DualDiscriminator(nn.Module):
    """(dual_discriminator.DualDiscriminator:107): discriminates the SR image
    concatenated with the bilinearly-upsampled raw neural render."""

    img_resolution: int = 512
    channel_base: int = 32768
    channel_max: int = 512

    @nn.compact
    def __call__(self, image: jnp.ndarray, image_raw: jnp.ndarray) -> jnp.ndarray:
        raw_up = resize_bilinear(image_raw, image.shape[1], antialias=True)
        pair = jnp.concatenate([image, raw_up], axis=-1)
        return Discriminator(self.img_resolution, img_channels=6,
                             channel_base=self.channel_base,
                             channel_max=self.channel_max, name="disc")(pair)
