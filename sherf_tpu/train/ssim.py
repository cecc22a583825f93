"""SSIM in pure JAX.

Matches pytorch_msssim.ssim defaults (the reference training loss,
loss.py:159: data_range=1, size_average=False — gaussian window 11,
sigma 1.5, K=(0.01, 0.03), valid-mode convolution).  Also provides a
mask-weighted variant so the training loss stays fully on-device instead of
the reference's per-step cv2.boundingRect host sync (loss.py:154-160).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return g


def _filter2d_sep(x: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable valid-mode filtering.  x: (B, H, W, C)."""
    C = x.shape[-1]
    kh = jnp.asarray(k1d, x.dtype).reshape(-1, 1, 1, 1)
    kh = jnp.tile(kh, (1, 1, 1, C))
    kw = jnp.asarray(k1d, x.dtype).reshape(1, -1, 1, 1)
    kw = jnp.tile(kw, (1, 1, 1, C))
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                 feature_group_count=C)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                 feature_group_count=C)
    return x


def ssim_map(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
             win_size: int = 11, sigma: float = 1.5,
             k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Per-pixel SSIM over valid windows.  x, y: (B, H, W, C).
    Returns (B, H - w + 1, W - w + 1, C)."""
    k = _gaussian_kernel(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter2d_sep(x, k)
    mu_y = _filter2d_sep(y, k)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_sep(x * x, k) - mu_xx
    sigma_yy = _filter2d_sep(y * y, k) - mu_yy
    sigma_xy = _filter2d_sep(x * y, k) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    return ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs


def ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
         mask: Optional[jnp.ndarray] = None, win_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM per image, (B,).  With ``mask`` (B, H, W), the per-pixel map
    is averaged over windows whose centers are masked — the static-shape
    stand-in for the reference's boundingRect crop."""
    m = ssim_map(x, y, data_range, win_size, sigma)
    if mask is None:
        return jnp.mean(m, axis=(1, 2, 3))
    off = (win_size - 1) // 2
    mc = mask[:, off: off + m.shape[1], off: off + m.shape[2]]
    w = mc[..., None].astype(m.dtype)  # (B, h, w, 1) broadcast over channels
    num = jnp.sum(m * w, axis=(1, 2, 3))
    den = jnp.maximum(jnp.sum(w, axis=(1, 2, 3)) * m.shape[-1], 1.0)
    return num / den
