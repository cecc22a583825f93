"""Host-side eval metrics.

Replicates the reference eval exactly (test_loop.py:36-84):
  * PSNR over mask_at_box pixels (img2mse + mse2psnr)
  * SSIM via skimage.structural_similarity(multichannel=True) on the
    cv2.boundingRect person crop.  NOTE the reference passes float images
    WITHOUT data_range, so legacy skimage assumes the float dtype range of
    2.0 — we replicate that quirk (data_range=2.0 default) for number
    parity with published results.
  * LPIPS on the same crop (only when VGG weights are available).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def psnr_np(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray) -> float:
    mse = float(np.mean((pred[mask] - gt[mask]) ** 2))
    return float(-10.0 * np.log(mse) / np.log(10.0))


def _uniform_filter(x: np.ndarray, win: int) -> np.ndarray:
    """Valid-mode win x win mean filter via cumsum (2D per channel)."""
    pad = np.cumsum(np.cumsum(x, axis=0), axis=1)
    pad = np.pad(pad, ((1, 0), (1, 0)) + ((0, 0),) * (x.ndim - 2))
    s = (pad[win:, win:] - pad[:-win, win:] - pad[win:, :-win] + pad[:-win, :-win])
    return s / (win * win)


def ssim_np(a: np.ndarray, b: np.ndarray, data_range: float = 2.0,
            win: int = 7) -> float:
    """skimage.metrics.structural_similarity with default settings
    (uniform 7x7 window, unbiased covariance, channel-averaged)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    NP = win * win
    cov_norm = NP / (NP - 1)
    ux = _uniform_filter(a, win)
    uy = _uniform_filter(b, win)
    uxx = _uniform_filter(a * a, win)
    uyy = _uniform_filter(b * b, win)
    uxy = _uniform_filter(a * b, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    return float(S.mean())


_LPIPS_APPLY = None


def _lpips_apply():
    """Lazy LPIPS (returns None without weights)."""
    global _LPIPS_APPLY
    if _LPIPS_APPLY is None:
        from sherf_tpu.train.lpips import LPIPS, lpips_params
        params = lpips_params()
        if params is None:
            _LPIPS_APPLY = False
        else:
            import jax

            model = LPIPS()
            _LPIPS_APPLY = jax.jit(
                lambda a, b: model.apply({"params": params}, a, b))
    return _LPIPS_APPLY or None


def crop_metrics(img_pred: np.ndarray, img_gt: np.ndarray,
                 mask_at_box: np.ndarray) -> Tuple[float, Optional[float]]:
    """(SSIM, LPIPS-or-None) on the boundingRect person crop
    (test_loop.ssim_metric:67-84)."""
    import cv2

    x, y, w, h = cv2.boundingRect(mask_at_box.astype(np.uint8))
    crop_pred = img_pred[y:y + h, x:x + w]
    crop_gt = img_gt[y:y + h, x:x + w]
    s = ssim_np(crop_pred, crop_gt)

    lp = None
    fn = _lpips_apply()
    if fn is not None:
        import jax.numpy as jnp

        a = jnp.asarray(crop_pred, jnp.float32)[None] * 2 - 1
        b = jnp.asarray(crop_gt, jnp.float32)[None] * 2 - 1
        lp = float(np.asarray(fn(a, b))[0])
    return s, lp
