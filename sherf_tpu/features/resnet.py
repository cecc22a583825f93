"""ResNet-18 image encoders (flax).

The reference wraps torchvision's resnet18 twice (triplane.py:320-343):
  * ``encoder_2d``          — full network -> 512-d global embedding that
    replaces the GAN latent z (triplane.py:73-75);
  * ``encoder_2d_feature``  — conv1/bn/relu (maxpool skipped!) + layer1 ->
    64-channel stride-2 feature map for pixel-aligned lookups
    (triplane.py:108, extract_feature=True path at triplane.py:325-335).

This is the same architecture built natively in flax/NHWC; torchvision
weights import via compat.legacy_import.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # frozen-BN semantics: running stats are never updated inside the
        # jitted train step (affine params still train); stats come from
        # init or checkpoint import
        del train
        norm = lambda name: nn.BatchNorm(use_running_average=True,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = norm("down_bn")(x)
        return nn.relu(x + y)


class ResNet18(nn.Module):
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    channels: Sequence[int] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, extract_feature: bool = False,
                 train: bool = False):
        """x: (B, H, W, 3).

        extract_feature=False -> (B, 512) global embedding.
        extract_feature=True  -> (B, H/2, W/2, 64) feature map (maxpool
        skipped, stop after layer1 — triplane.py:325-335).
        """
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        if not extract_feature:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, (n_blocks, ch) in enumerate(zip(self.stage_sizes, self.channels)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = BasicBlock(ch, stride, self.dtype,
                               name=f"layer{i + 1}_{b}")(x, train=train)
            if extract_feature and i == 0:
                return x

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x
