"""Alias-free (StyleGAN3) synthesis networks, TPU-native.

Re-design of the reference's training/networks_stylegan3.py for NHWC/XLA:
the 1.8k-line filtered_lrelu CUDA kernel family becomes the
:func:`sherf_tpu.kernels.filters.filtered_lrelu` composition (zero-stuff +
FIR + stride lower to convs XLA fuses on the MXU), and the grouped
modulated conv uses the same batch-folded NHWC trick as our StyleGAN2 port.

In the reference, this file's only live import is ``SynthesisLayer`` (as
``AFSynthesisLayer``, superresolution.py:22, itself unused by shipped SHERF
configs); the full network is provided here for API completeness.

Reference symbols: modulated_conv2d (networks_stylegan3.py:27-66),
SynthesisInput (:171-253), SynthesisLayer (:255-396),
SynthesisNetwork (:401-489), Generator (:492-517).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sherf_tpu.kernels.filters import filtered_lrelu
from sherf_tpu.features.stylegan2 import EqualDense, MappingNetwork


def modulated_conv2d(x: jnp.ndarray, weight: jnp.ndarray, styles: jnp.ndarray,
                     demodulate: bool = True, padding: int = 0,
                     input_gain: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SG3 modulated conv (networks_stylegan3.py:27-66): pre-normalizes both
    weight and styles before modulation.  x: (B,H,W,Cin); weight: (kh,kw,
    Cin,Cout) HWIO; styles: (B,Cin)."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape

    if demodulate:
        weight = weight * jax.lax.rsqrt(
            jnp.mean(jnp.square(weight), axis=(0, 1, 2), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))

    w = weight[None] * styles[:, None, None, :, None]      # (B,kh,kw,Cin,Cout)
    if demodulate:
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(1, 2, 3)) + 1e-8)
        w = w * dcoefs[:, None, None, None, :]
    if input_gain is not None:
        gain = jnp.broadcast_to(jnp.asarray(input_gain), (B, Cin))
        w = w * gain[:, None, None, :, None]

    # grouped conv with per-sample weights: fold batch into channels (NHWC)
    x = jnp.moveaxis(x, 0, 2).reshape(1, H, W, B * Cin)
    wg = jnp.moveaxis(w, 0, 3).reshape(kh, kw, Cin, B * Cout)
    y = jax.lax.conv_general_dilated(
        x, wg.astype(x.dtype), window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=B)
    y = y.reshape(y.shape[1], y.shape[2], B, Cout)
    return jnp.moveaxis(y, 2, 0)


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False) -> Optional[np.ndarray]:
    """Kaiser (separable) or jinc (radial) low-pass FIR design
    (networks_stylegan3.py:365-386).  Returns None for the identity."""
    assert numtaps >= 1
    if numtaps == 1:
        return None
    import scipy.signal
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return np.asarray(f, dtype=np.float32)
    import scipy.special
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[r == 0] = cutoff ** 2  # lim_{r->0} j1(2 c pi r)/(pi r) = c^2... see note
    # NOTE: the exact limit is c^2 * pi / pi = c^2; the reference leaves the
    # NaN at the center to be normalized away only when numtaps is even (no
    # center tap).  For odd taps we substitute the analytic limit.
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f = f * np.outer(w, w)
    f = f / np.sum(f)
    return np.asarray(f, dtype=np.float32)


class SynthesisInput(nn.Module):
    """Fourier-feature input plane with a learned affine transform
    (networks_stylegan3.py:171-253).  Frequencies/phases are fixed random
    buffers; ``transform`` is the user-controllable inverse transform."""

    w_dim: int
    channels: int
    size: int
    sampling_rate: float
    bandwidth: float

    @nn.compact
    def __call__(self, w: jnp.ndarray) -> jnp.ndarray:
        size = np.broadcast_to(np.asarray(self.size), [2])

        def init_freqs():
            rnd = np.random.RandomState(1234 + self.channels)
            freqs = rnd.randn(self.channels, 2)
            radii = np.sqrt(np.sum(freqs ** 2, axis=1, keepdims=True))
            freqs = freqs / (radii * np.exp(radii ** 2) ** 0.25)
            freqs = freqs * self.bandwidth
            phases = rnd.rand(self.channels) - 0.5
            return (jnp.asarray(freqs, jnp.float32),
                    jnp.asarray(phases, jnp.float32))

        buf = self.variable("buffers", "freqs_phases", init_freqs)
        freqs0, phases0 = buf.value
        transform = self.variable("buffers", "transform",
                                  lambda: jnp.eye(3, dtype=jnp.float32))
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.channels, self.channels))

        B = w.shape[0]
        # affine: weight_init=0, bias_init=[1,0,0,0] — identity at init
        aw = self.param("affine_weight", nn.initializers.zeros,
                        (4, self.w_dim))
        ab = self.param("affine_bias",
                        lambda *_: jnp.asarray([1.0, 0, 0, 0]), (4,))
        t = w.astype(jnp.float32) @ (aw.T / np.sqrt(self.w_dim)) + ab
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)

        m_r = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
        m_r = m_r.at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1])
        m_r = m_r.at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0])
        m_t = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
        m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
        transforms = m_r @ m_t @ transform.value[None]

        phases = phases0[None] + jnp.squeeze(
            freqs0[None] @ transforms[:, :2, 2:], -1)
        freqs = freqs0[None] @ transforms[:, :2, :2]
        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(freqs, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth), 0, 1)

        # sampling grid (align_corners=False affine_grid over [-1,1])
        sx = 0.5 * size[0] / self.sampling_rate
        sy = 0.5 * size[1] / self.sampling_rate
        gx = (np.arange(size[0]) + 0.5) / size[0] * 2 - 1
        gy = (np.arange(size[1]) + 0.5) / size[1] * 2 - 1
        grid = np.stack(np.meshgrid(gx * sx, gy * sy, indexing="xy"), axis=-1)
        grid = jnp.asarray(grid, jnp.float32)                  # (H, W, 2)

        x = jnp.einsum("hwk,bck->bhwc", grid, freqs)
        x = x + phases[:, None, None, :]
        x = jnp.sin(x * (2 * np.pi))
        x = x * amplitudes[:, None, None, :]
        x = x @ (weight.T / np.sqrt(self.channels))
        return x                                               # (B, H, W, C)


class SynthesisLayer(nn.Module):
    """Alias-free synthesis layer (networks_stylegan3.py:255-363): modulated
    conv -> upsample FIR -> leaky-relu -> downsample FIR, with Kaiser/jinc
    filters designed from the layer's cutoff/stopband spec."""

    w_dim: int
    is_torgb: bool
    is_critically_sampled: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: float
    out_sampling_rate: float
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256.0
    magnitude_ema_beta: float = 0.999
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray,
                 update_emas: bool = False) -> jnp.ndarray:
        in_size = np.broadcast_to(np.asarray(self.in_size), [2])
        out_size = np.broadcast_to(np.asarray(self.out_size), [2])
        conv_kernel = 1 if self.is_torgb else self.conv_kernel
        tmp_rate = max(self.in_sampling_rate, self.out_sampling_rate) \
            * (1 if self.is_torgb else self.lrelu_upsampling)

        up_factor = int(np.rint(tmp_rate / self.in_sampling_rate))
        up_taps = self.filter_size * up_factor \
            if up_factor > 1 and not self.is_torgb else 1
        up_filter = design_lowpass_filter(
            up_taps, self.in_cutoff, self.in_half_width * 2, tmp_rate)
        down_factor = int(np.rint(tmp_rate / self.out_sampling_rate))
        down_taps = self.filter_size * down_factor \
            if down_factor > 1 and not self.is_torgb else 1
        down_radial = self.use_radial_filters and not self.is_critically_sampled
        down_filter = design_lowpass_filter(
            down_taps, self.out_cutoff, self.out_half_width * 2, tmp_rate,
            radial=down_radial)
        # separable Kaiser filters applied as their full 2D outer product
        if up_filter is not None and up_filter.ndim == 1:
            up_filter = np.outer(up_filter, up_filter)
        if down_filter is not None and down_filter.ndim == 1:
            down_filter = np.outer(down_filter, down_filter)

        pad_total = (out_size - 1) * down_factor + 1
        pad_total = pad_total - (in_size + conv_kernel - 1) * up_factor
        pad_total = pad_total + up_taps + down_taps - 2
        pad_lo = (pad_total + up_factor) // 2
        pad_hi = pad_total - pad_lo
        padding = [int(pad_lo[0]), int(pad_hi[0]), int(pad_lo[1]), int(pad_hi[1])]

        weight = self.param("weight", nn.initializers.normal(1.0),
                            (conv_kernel, conv_kernel, self.in_channels,
                             self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        magnitude_ema = self.variable("batch_stats", "magnitude_ema",
                                      lambda: jnp.ones((), jnp.float32))

        if update_emas:
            mag = jnp.mean(jnp.square(
                jax.lax.stop_gradient(x).astype(jnp.float32)))
            magnitude_ema.value = mag + (magnitude_ema.value - mag) \
                * self.magnitude_ema_beta
        input_gain = jax.lax.rsqrt(magnitude_ema.value)

        styles = EqualDense(self.in_channels, bias_init=1.0,
                            name="affine")(w.astype(jnp.float32))
        if self.is_torgb:
            styles = styles / np.sqrt(self.in_channels * conv_kernel ** 2)

        x = modulated_conv2d(x.astype(self.dtype), weight.astype(self.dtype),
                             styles.astype(self.dtype),
                             demodulate=not self.is_torgb,
                             padding=conv_kernel - 1, input_gain=input_gain)
        gain = 1.0 if self.is_torgb else float(np.sqrt(2))
        slope = 1.0 if self.is_torgb else 0.2
        x = filtered_lrelu(x, fu=up_filter, fd=down_filter,
                           b=bias.astype(x.dtype), up=up_factor,
                           down=down_factor, padding=padding, gain=gain,
                           slope=slope, clamp=self.conv_clamp)
        assert x.shape == (w.shape[0], int(out_size[1]), int(out_size[0]),
                           self.out_channels), x.shape
        return x


def _layer_specs(img_resolution: int, channel_base: int, channel_max: int,
                 num_layers: int, num_critical: int, first_cutoff: float,
                 first_stopband: float, last_stopband_rel: float,
                 margin_size: int, img_channels: int):
    """Geometric cutoff/stopband progression (networks_stylegan3.py:422-436)."""
    last_cutoff = img_resolution / 2
    last_stopband = last_cutoff * last_stopband_rel
    exponents = np.minimum(
        np.arange(num_layers + 1) / (num_layers - num_critical), 1)
    cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
    stopbands = first_stopband * (last_stopband / first_stopband) ** exponents
    sampling_rates = np.exp2(np.ceil(np.log2(
        np.minimum(stopbands * 2, img_resolution))))
    half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
    sizes = sampling_rates + margin_size * 2
    sizes[-2:] = img_resolution
    channels = np.rint(np.minimum((channel_base / 2) / cutoffs, channel_max))
    channels[-1] = img_channels
    return cutoffs, half_widths, sampling_rates, sizes.astype(int), \
        channels.astype(int)


class SynthesisNetwork(nn.Module):
    """(networks_stylegan3.py:401-489)"""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    output_scale: float = 0.25
    dtype: Any = jnp.float32

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2

    @nn.compact
    def __call__(self, ws: jnp.ndarray, update_emas: bool = False):
        cutoffs, half_widths, rates, sizes, channels = _layer_specs(
            self.img_resolution, self.channel_base, self.channel_max,
            self.num_layers, self.num_critical, self.first_cutoff,
            self.first_stopband, self.last_stopband_rel, self.margin_size,
            self.img_channels)

        ws32 = ws.astype(jnp.float32)
        x = SynthesisInput(self.w_dim, int(channels[0]), int(sizes[0]),
                           float(rates[0]), float(cutoffs[0]),
                           name="input")(ws32[:, 0])
        for idx in range(self.num_layers + 1):
            prev = max(idx - 1, 0)
            is_torgb = idx == self.num_layers
            x = SynthesisLayer(
                w_dim=self.w_dim, is_torgb=is_torgb,
                is_critically_sampled=idx >= self.num_layers - self.num_critical,
                in_channels=int(channels[prev]), out_channels=int(channels[idx]),
                in_size=int(sizes[prev]), out_size=int(sizes[idx]),
                in_sampling_rate=float(rates[prev]),
                out_sampling_rate=float(rates[idx]),
                in_cutoff=float(cutoffs[prev]), out_cutoff=float(cutoffs[idx]),
                in_half_width=float(half_widths[prev]),
                out_half_width=float(half_widths[idx]), dtype=self.dtype,
                name=f"L{idx}_{int(sizes[idx])}_{int(channels[idx])}",
            )(x, ws32[:, idx + 1], update_emas=update_emas)
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)     # (B, H, W, img_channels)


class SG3Generator(nn.Module):
    """Full alias-free generator (networks_stylegan3.py:492-517): mapping
    (shared with the SG2 port) + alias-free synthesis."""

    z_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    num_layers: int = 14
    channel_base: int = 32768
    channel_max: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, truncation_psi: float = 1.0,
                 update_emas: bool = False) -> jnp.ndarray:
        synthesis = SynthesisNetwork(
            self.w_dim, self.img_resolution, self.img_channels,
            channel_base=self.channel_base, channel_max=self.channel_max,
            num_layers=self.num_layers, dtype=self.dtype, name="synthesis")
        ws = MappingNetwork(self.w_dim, synthesis.num_ws,
                            name="mapping")(z, truncation_psi=truncation_psi)
        return synthesis(ws, update_emas=update_emas)
