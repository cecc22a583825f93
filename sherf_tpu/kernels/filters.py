"""StyleGAN2 resampling primitives as native XLA ops.

TPU equivalents of the reference's CUDA kernels (torch_utils/ops/
upfirdn2d.{cpp,cu}, bias_act.{cpp,cu}) and of the composition logic in
torch_utils/ops/conv2d_resample.py.  On TPU there is nothing to hand-fuse:
zero-stuff + pad + depthwise FIR + stride decompose into ops XLA fuses into
the surrounding convolutions, and the MXU handles the convs themselves.

Layout: images are NHWC (TPU-native).  Semantics (padding arithmetic, filter
flipping, gains) follow the reference wrappers so that imported checkpoints
reproduce outputs.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Activation table (reference bias_act.py:23-33)

ACTIVATIONS = {
    "linear": dict(fn=lambda x, a: x, def_alpha=0.0, def_gain=1.0),
    "relu": dict(fn=lambda x, a: jax.nn.relu(x), def_alpha=0.0, def_gain=float(np.sqrt(2))),
    "lrelu": dict(fn=lambda x, a: jax.nn.leaky_relu(x, a), def_alpha=0.2, def_gain=float(np.sqrt(2))),
    "tanh": dict(fn=lambda x, a: jnp.tanh(x), def_alpha=0.0, def_gain=1.0),
    "sigmoid": dict(fn=lambda x, a: jax.nn.sigmoid(x), def_alpha=0.0, def_gain=1.0),
    "elu": dict(fn=lambda x, a: jax.nn.elu(x), def_alpha=0.0, def_gain=1.0),
    "selu": dict(fn=lambda x, a: jax.nn.selu(x), def_alpha=0.0, def_gain=1.0),
    "softplus": dict(fn=lambda x, a: jax.nn.softplus(x), def_alpha=0.0, def_gain=1.0),
    "swish": dict(fn=lambda x, a: jax.nn.sigmoid(x) * x, def_alpha=0.0, def_gain=float(np.sqrt(2))),
}


def bias_act(x: jnp.ndarray, b: Optional[jnp.ndarray] = None, *, axis: int = -1,
             act: str = "linear", alpha: Optional[float] = None,
             gain: Optional[float] = None, clamp: Optional[float] = None) -> jnp.ndarray:
    """Fused bias + activation + gain + clamp (reference bias_act.py:54-90).

    ``axis`` is the channel axis the bias broadcasts over (-1 for NHWC).
    """
    spec = ACTIVATIONS[act]
    alpha = spec["def_alpha"] if alpha is None else float(alpha)
    gain = spec["def_gain"] if gain is None else float(gain)
    if b is not None:
        shape = [1] * x.ndim
        shape[axis] = b.shape[0]
        x = x + b.reshape(shape)
    x = spec["fn"](x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


# ---------------------------------------------------------------------------
# upfirdn2d

def setup_filter(f, normalize: bool = True, flip_filter: bool = False,
                 gain: float = 1.0, separable: Optional[bool] = None) -> np.ndarray:
    """Prepare a 2D FIR filter (reference upfirdn2d.setup_filter).  Returns a
    numpy float32 array of shape (fh, fw); 1D inputs are outer-producted
    unless explicitly separable (we always materialize 2D — filters here are
    4-tap, the outer product is trivial)."""
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 0:
        f = f[None]
    assert f.ndim in (1, 2)
    if f.ndim == 1:
        f = np.outer(f, f)
        eff_ndim = 2
    else:
        eff_ndim = 2
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1, ::-1]
    f = f * (gain ** (eff_ndim / 2))
    return np.ascontiguousarray(f, dtype=np.float32)


def _parse_scaling(s) -> tuple:
    if isinstance(s, int):
        return s, s
    sx, sy = s
    return int(sx), int(sy)


def _parse_padding(p) -> tuple:
    if isinstance(p, int):
        return p, p, p, p
    p = list(p)
    if len(p) == 2:
        px, py = p
        return px, px, py, py
    px0, px1, py0, py1 = p
    return px0, px1, py0, py1


def upfirdn2d(x: jnp.ndarray, f: Optional[np.ndarray], up=1, down=1, padding=0,
              flip_filter: bool = False, gain: float = 1.0) -> jnp.ndarray:
    """Pad -> upsample -> FIR filter -> downsample (reference upfirdn2d.py:120
    /_upfirdn2d_ref:169).  x: (N, H, W, C) float.  f: (fh, fw) numpy or None.
    """
    N, H, W, C = x.shape
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)

    # 1. Upsample by zero insertion.
    if upx > 1 or upy > 1:
        x = x.reshape(N, H, 1, W, 1, C)
        x = jnp.pad(x, [(0, 0), (0, 0), (0, upy - 1), (0, 0), (0, upx - 1), (0, 0)])
        x = x.reshape(N, H * upy, W * upx, C)

    # 2. Pad / crop.
    x = jnp.pad(x, [(0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0)), (0, 0)])
    if min(px0, px1, py0, py1) < 0:
        x = x[:, max(-py0, 0): x.shape[1] - max(-py1, 0),
              max(-px0, 0): x.shape[2] - max(-px1, 0), :]

    # 3. FIR filter (depthwise conv).  Default (flip_filter=False) is true
    # convolution, i.e. the kernel is flipped relative to correlation.
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    fh, fw = f.shape
    ker = np.asarray(f, dtype=np.float32)
    if not flip_filter:
        ker = ker[::-1, ::-1]
    kernel = jnp.asarray(np.ascontiguousarray(ker), dtype=x.dtype) * jnp.asarray(gain, x.dtype)
    kernel = jnp.tile(kernel[:, :, None, None], (1, 1, 1, C))  # HWIO depthwise
    x = lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )

    # 4. Downsample.
    if downy > 1 or downx > 1:
        x = x[:, ::downy, ::downx, :]
    return x


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """Same-size FIR filtering (reference upfirdn2d.filter2d)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fh, fw = f.shape
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """FIR upsampling (reference upfirdn2d.upsample2d)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fh, fw = f.shape
    p = [px0 + (fw + upx - 1) // 2, px1 + (fw - upx) // 2,
         py0 + (fh + upy - 1) // 2, py1 + (fh - upy) // 2]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """FIR downsampling (reference upfirdn2d.downsample2d)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fh, fw = f.shape
    p = [px0 + (fw - downx + 1) // 2, px1 + (fw - downx) // 2,
         py0 + (fh - downy + 1) // 2, py1 + (fh - downy) // 2]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


# ---------------------------------------------------------------------------
# filtered_lrelu (reference torch_utils/ops/filtered_lrelu.py:58-158)

def filtered_lrelu(x: jnp.ndarray, fu: Optional[np.ndarray] = None,
                   fd: Optional[np.ndarray] = None,
                   b: Optional[jnp.ndarray] = None, up: int = 1, down: int = 1,
                   padding=0, gain: float = float(np.sqrt(2)),
                   slope: float = 0.2, clamp: Optional[float] = None,
                   flip_filter: bool = False) -> jnp.ndarray:
    """StyleGAN3's fused upsample -> leaky-relu -> downsample.

    TPU equivalent of the reference's 1.8k-line CUDA kernel
    (filtered_lrelu.{cpp,cu}); semantics follow `_filtered_lrelu_ref`
    exactly — on TPU the zero-stuff/FIR/stride decomposition lowers to
    convolutions XLA fuses, so there is nothing to hand-schedule.

    x: (N, H, W, C).  fu/fd: 2D numpy FIR filters (or None = identity).
    """
    px0, px1, py0, py1 = _parse_padding(padding)
    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1],
                  gain=up ** 2, flip_filter=flip_filter)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x


# ---------------------------------------------------------------------------
# conv2d_resample

def conv2d_resample(x: jnp.ndarray, w: jnp.ndarray, f: Optional[np.ndarray] = None,
                    up: int = 1, down: int = 1, padding=0, groups: int = 1,
                    flip_weight: bool = True) -> jnp.ndarray:
    """Conv2d with optional FIR up/downsampling (reference
    conv2d_resample.py:48-144, generic path — on TPU XLA fuses the
    decomposition, so the CUDA fast paths are unnecessary).

    x: (N, H, W, C_in); w: (kh, kw, C_in // groups, C_out) HWIO.
    flip_weight=True means correlation (torch conv2d 'conv').
    """
    kh, kw = int(w.shape[0]), int(w.shape[1])
    if f is not None:
        fh, fw = f.shape
    else:
        fh = fw = 1
    px0, px1, py0, py1 = _parse_padding(padding)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    x = upfirdn2d(x, f if up > 1 else None, up=up,
                  padding=[px0, px1, py0, py1], gain=up ** 2)

    if not flip_weight and (kh > 1 or kw > 1):
        w = w[::-1, ::-1]
    x = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )

    if down > 1:
        x = upfirdn2d(x, f, down=down)
    return x
