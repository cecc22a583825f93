"""StyleGAN2 synthesis backbone in flax/NHWC.

Native rebuild of the reference's ``training/networks_stylegan2.py`` (itself
EG3D's fork of NVlabs StyleGAN2): equalized-lr dense layers, modulated
convolutions with demodulation, FIR resampling, skip-architecture synthesis
emitting the 96-channel triplane stack (3 planes x 32ch at 256x256,
triplane.py:59,150).

TPU notes:
  * modulated conv executes either "fused" (per-sample weights via grouped
    conv — one big MXU matmul) or "unfused" (scale activations, shared
    weights), matching networks_stylegan2.py:34-91; both are exposed
    because checkpoints were trained with unfused and evaluated fused.
  * the reference's fp16-above-res-32 policy maps to bfloat16 here
    (dtype attribute); default float32 for import parity.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from sherf_tpu.kernels.filters import (
    bias_act, conv2d_resample, setup_filter, upsample2d, ACTIVATIONS,
)

DEFAULT_FILTER = setup_filter([1, 3, 3, 1])


def normalize_2nd_moment(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8):
    """(reference networks_stylegan2.py:28-29)"""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class EqualDense(nn.Module):
    """FullyConnectedLayer (networks_stylegan2.py:96-127): weights stored at
    unit scale, runtime gain lr_multiplier/sqrt(in)."""

    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_multiplier),
                       (self.out_features, in_features))
        gain = self.lr_multiplier / np.sqrt(in_features)
        y = x @ (w.astype(x.dtype).T * gain)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.constant(self.bias_init),
                           (self.out_features,))
            b = (b * self.lr_multiplier).astype(x.dtype)
        return bias_act(y, b, act=self.activation)


class EqualConv2d(nn.Module):
    """Conv2dLayer (networks_stylegan2.py:135-188): equalized-lr conv with
    optional FIR up/down-sampling and fused bias+activation."""

    out_channels: int
    kernel_size: int = 3
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
        in_channels = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.kernel_size, self.kernel_size, in_channels,
                        self.out_channels))
        weight_gain = 1.0 / np.sqrt(in_channels * self.kernel_size ** 2)
        x = conv2d_resample(x, (w * weight_gain).astype(x.dtype),
                            f=DEFAULT_FILTER, up=self.up, down=self.down,
                            padding=self.kernel_size // 2,
                            flip_weight=(self.up == 1))
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_channels,)).astype(x.dtype)
        act_gain = ACTIVATIONS[self.activation]["def_gain"] * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=clamp)


def modulated_conv2d(x: jnp.ndarray, weight: jnp.ndarray, styles: jnp.ndarray,
                     noise: Optional[jnp.ndarray] = None, up: int = 1, down: int = 1,
                     padding: int = 0, resample_filter: Optional[np.ndarray] = None,
                     demodulate: bool = True, flip_weight: bool = True,
                     fused_modconv: bool = True) -> jnp.ndarray:
    """(networks_stylegan2.py:34-91).  x: (B,H,W,Cin); weight: (kh,kw,Cin,Cout)
    HWIO; styles: (B,Cin)."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape

    w = None
    dcoefs = None
    if demodulate or fused_modconv:
        w = weight[None] * styles[:, None, None, :, None]  # (B,kh,kw,Cin,Cout)
    if demodulate:
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(1, 2, 3)) + 1e-8)  # (B,Cout)
    if demodulate and fused_modconv:
        w = w * dcoefs[:, None, None, None, :]

    if not fused_modconv:
        x = x * styles[:, None, None, :].astype(x.dtype)
        x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter, up=up,
                            down=down, padding=padding, flip_weight=flip_weight)
        if demodulate:
            x = x * dcoefs[:, None, None, :].astype(x.dtype)
        if noise is not None:
            x = x + noise.astype(x.dtype)
        return x

    # Fused: grouped conv with per-sample weights.  NHWC: fold batch into the
    # channel axis (channel index = b * Cin + c).
    x = jnp.moveaxis(x, 0, 2).reshape(1, H, W, B * Cin)
    w = jnp.moveaxis(w, 0, 3).reshape(kh, kw, Cin, B * Cout)
    y = conv2d_resample(x, w.astype(x.dtype), f=resample_filter, up=up, down=down,
                        padding=padding, groups=B, flip_weight=flip_weight)
    y = y.reshape(y.shape[1], y.shape[2], B, Cout)
    y = jnp.moveaxis(y, 2, 0)  # (B, H', W', Cout)
    if noise is not None:
        y = y + noise.astype(y.dtype)
    return y


class SynthesisLayer(nn.Module):
    """(networks_stylegan2.py:276-337)"""

    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    conv_clamp: Optional[float] = 256.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w, noise_mode: str = "random",
                 fused_modconv: bool = True, gain: float = 1.0):
        in_channels = x.shape[-1]
        styles = EqualDense(in_channels, bias_init=1.0, name="affine")(w.astype(jnp.float32))
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.kernel_size, self.kernel_size, in_channels,
                             self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        noise = None
        if self.use_noise:
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            # fixed random buffer (not trained); overwritten on checkpoint
            # import, deterministic numpy init otherwise
            noise_const = self.variable(
                "noise", "noise_const",
                lambda: jnp.asarray(np.random.RandomState(self.resolution)
                                    .randn(self.resolution, self.resolution),
                                    jnp.float32))
            if noise_mode == "random":
                noise = jax.random.normal(
                    self.make_rng("noise"),
                    (x.shape[0], self.resolution, self.resolution, 1)) * noise_strength
            elif noise_mode == "const":
                noise = (noise_const.value * noise_strength)[None, :, :, None]

        flip_weight = (self.up == 1)
        x = modulated_conv2d(
            x.astype(self.dtype), weight.astype(self.dtype), styles.astype(self.dtype),
            noise=noise, up=self.up, padding=self.kernel_size // 2,
            resample_filter=DEFAULT_FILTER, flip_weight=flip_weight,
            fused_modconv=fused_modconv)

        spec_gain = ACTIVATIONS[self.activation]["def_gain"] * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, bias.astype(x.dtype), act=self.activation,
                        gain=spec_gain, clamp=clamp)


class ToRGBLayer(nn.Module):
    """(networks_stylegan2.py:342-362)"""

    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = 256.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w, fused_modconv: bool = True):
        in_channels = x.shape[-1]
        weight_gain = 1.0 / np.sqrt(in_channels * self.kernel_size ** 2)
        styles = EqualDense(in_channels, bias_init=1.0, name="affine")(
            w.astype(jnp.float32)) * weight_gain
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.kernel_size, self.kernel_size, in_channels,
                             self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        x = modulated_conv2d(x.astype(self.dtype), weight.astype(self.dtype),
                             styles.astype(self.dtype), demodulate=False,
                             fused_modconv=fused_modconv)
        return bias_act(x, bias.astype(x.dtype), clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """Skip-architecture block (networks_stylegan2.py:367-466)."""

    in_channels: int            # 0 = first (const) block
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    conv_clamp: float = 256.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, img, ws, noise_mode: str = "random",
                 fused_modconv: Optional[bool] = None):
        if fused_modconv is None:
            fused_modconv = True
        w_iter = iter([ws[:, i] for i in range(ws.shape[1])])

        if self.in_channels == 0:
            const = self.param("const", nn.initializers.normal(1.0),
                               (self.resolution, self.resolution, self.out_channels))
            x = jnp.tile(const[None].astype(self.dtype), (ws.shape[0], 1, 1, 1))
        else:
            x = x.astype(self.dtype)
            x = SynthesisLayer(self.out_channels, self.w_dim, self.resolution,
                               up=2, conv_clamp=self.conv_clamp, dtype=self.dtype,
                               name="conv0")(x, next(w_iter), noise_mode=noise_mode,
                                             fused_modconv=fused_modconv)
        x = SynthesisLayer(self.out_channels, self.w_dim, self.resolution,
                           conv_clamp=self.conv_clamp, dtype=self.dtype,
                           name="conv1")(x, next(w_iter), noise_mode=noise_mode,
                                         fused_modconv=fused_modconv)

        if img is not None:
            img = upsample2d(img, DEFAULT_FILTER)
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(self.img_channels, self.w_dim,
                           conv_clamp=self.conv_clamp, dtype=self.dtype,
                           name="torgb")(x, next(w_iter), fused_modconv=fused_modconv)
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    """(networks_stylegan2.py:471-533)  img_resolution=256, img_channels=96
    for the triplane backbone (triplane.py:59)."""

    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 96
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    use_bf16: bool = False  # map the reference's fp16 policy to bf16

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        log2 = int(np.log2(self.img_resolution))
        return tuple(2 ** i for i in range(2, log2 + 1))

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
            if res == self.img_resolution:
                n += 1
        return n

    @nn.compact
    def __call__(self, ws, noise_mode: str = "random",
                 fused_modconv: Optional[bool] = None):
        """ws: (B, num_ws, w_dim) -> (B, 256, 256, 96) triplane stack."""
        resolutions = self.block_resolutions
        channels = {res: min(self.channel_base // res, self.channel_max)
                    for res in resolutions}
        fp16_resolution = max(2 ** (int(np.log2(self.img_resolution)) + 1
                                    - self.num_fp16_res), 8)
        ws = ws.astype(jnp.float32)

        x = img = None
        w_idx = 0
        for res in resolutions:
            in_ch = channels[res // 2] if res > 4 else 0
            n_conv = 1 if res == 4 else 2
            is_last = res == self.img_resolution
            n_torgb = 1  # skip architecture: every block has torgb
            dtype = jnp.bfloat16 if (self.use_bf16 and res >= fp16_resolution) else jnp.float32
            block_ws = ws[:, w_idx: w_idx + n_conv + n_torgb]
            x, img = SynthesisBlock(
                in_ch, channels[res], self.w_dim, res, self.img_channels,
                is_last=is_last, dtype=dtype, name=f"b{res}",
            )(x, img, block_ws, noise_mode=noise_mode, fused_modconv=fused_modconv)
            w_idx += n_conv
        return img


class MappingNetwork(nn.Module):
    """(networks_stylegan2.py:193-271) — 2 layers in SHERF configs
    (train.py mapping_kwargs.num_layers = map_depth = 2); conditioning c is
    zeroed (c_gen_conditioning_zero), so the embed path is omitted."""

    w_dim: int = 512
    num_ws: int = 14
    num_layers: int = 2
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998

    @nn.compact
    def __call__(self, z, truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None,
                 update_emas: bool = False):
        x = normalize_2nd_moment(z.astype(jnp.float32))
        for idx in range(self.num_layers):
            x = EqualDense(self.w_dim, activation="lrelu",
                           lr_multiplier=self.lr_multiplier, name=f"fc{idx}")(x)

        w_avg = self.variable("ema", "w_avg", lambda: jnp.zeros((self.w_dim,)))
        if update_emas and not self.is_initializing():
            w_avg.value = jnp.mean(x, axis=0) + self.w_avg_beta * (
                w_avg.value - jnp.mean(x, axis=0))

        x = jnp.tile(x[:, None], (1, self.num_ws, 1))
        if truncation_psi != 1.0:
            if truncation_cutoff is None:
                x = w_avg.value + truncation_psi * (x - w_avg.value)
            else:
                head = w_avg.value + truncation_psi * (
                    x[:, :truncation_cutoff] - w_avg.value)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x


class StyleGAN2Backbone(nn.Module):
    """mapping + synthesis (networks_stylegan2.Generator:538-561)."""

    z_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 96
    mapping_layers: int = 2
    channel_base: int = 32768
    channel_max: int = 512
    use_bf16: bool = False

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, channel_base=self.channel_base,
            channel_max=self.channel_max, use_bf16=self.use_bf16)
        self.mapping = MappingNetwork(
            w_dim=self.w_dim, num_ws=self.synthesis.num_ws,
            num_layers=self.mapping_layers)

    def __call__(self, z, noise_mode: str = "random",
                 fused_modconv: Optional[bool] = None, **mapping_kwargs):
        ws = self.mapping(z, **mapping_kwargs)
        return self.synthesis(ws, noise_mode=noise_mode, fused_modconv=fused_modconv)
