"""ADA augmentation pipeline (JAX).

Re-design of the reference ``training/augment.py`` AugmentPipe (the
"Training GANs with Limited Data" pipeline; constructed only when
``--aug != noaug``, which is off in every shipped SHERF config —
train.py:181, SURVEY §2.2).  Knob names, probability semantics and the
transform taxonomy match the reference exactly:

  pixel blitting     x-flip, 90-degree rotations, integer translation
  geometric          isotropic/anisotropic scaling, rotation, frac. translation
  color              brightness, contrast, luma flip, hue rotation, saturation
  image-space        4-band frequency filtering
  corruptions        additive RGB noise, cutout

Design differences, chosen for XLA:
  * the whole pipe is a pure function of (images, rng, p) — no buffers, no
    module state; every knob is static so the branch structure is fixed at
    trace time (each `if self.x > 0` block disappears from the graph when
    disabled, same as the reference's Python-level checks);
  * all geometric transforms (blit + affine) compose into ONE inverse 3x3
    matrix per image and are applied with a single bilinear gather on a
    zero-padded canvas.  The reference instead pads, wavelet-upsamples 2x,
    warps, and downsamples (augment.py geometric section) to be exactly
    rotation-equivariant under its FIR filters — an antialias refinement
    that does not change the augmentation distribution's semantics;
  * images are NHWC (framework-wide convention) rather than NCHW.

The ADA feedback controller (p adjusted toward a target discriminator
sign(D_real) rate; reference training_loop.py:364-371) is `ada_adjust`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 2D/3D homogeneous transform helpers (reference augment.py:36-105)
# ---------------------------------------------------------------------------

def translate2d(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack([jnp.stack([o, z, tx], -1),
                      jnp.stack([z, o, ty], -1),
                      jnp.stack([z, z, o], -1)], -2)


def scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    return jnp.stack([jnp.stack([sx, z, z], -1),
                      jnp.stack([z, sy, z], -1),
                      jnp.stack([z, z, jnp.ones_like(sx)], -1)], -2)


def rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    return jnp.stack([jnp.stack([c, -s, z], -1),
                      jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def translate3d(v):
    m = jnp.broadcast_to(jnp.eye(4), v.shape[:-1] + (4, 4))
    return m.at[..., :3, 3].set(v)


def scale3d(v):
    m = jnp.broadcast_to(jnp.eye(4), v.shape[:-1] + (4, 4))
    return m.at[..., (0, 1, 2), (0, 1, 2)].set(v)


def rotate3d(axis, theta):
    """Rodrigues rotation about ``axis`` embedded in a 4x4 (augment.py:95)."""
    v = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1.0 - c
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    rows = [
        jnp.stack([vx * vx * cc + c, vx * vy * cc - vz * s,
                   vx * vz * cc + vy * s, z], -1),
        jnp.stack([vy * vx * cc + vz * s, vy * vy * cc + c,
                   vy * vz * cc - vx * s, z], -1),
        jnp.stack([vz * vx * cc - vy * s, vz * vy * cc + vx * s,
                   vz * vz * cc + c, z], -1),
        jnp.stack([z, z, z, o], -1),
    ]
    return jnp.stack(rows, -2)


def _affine_sample(img: jnp.ndarray, g_inv: jnp.ndarray) -> jnp.ndarray:
    """Warp (H, W, C) by the inverse transform g_inv (3, 3) acting on
    centered pixel coordinates (x right, y down, origin at image center),
    bilinear with zero padding."""
    H, W, _ = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    coords = jnp.stack([xs - cx, ys - cy, jnp.ones_like(xs)], 0).reshape(3, -1)
    src = g_inv @ coords
    sx = src[0] / src[2] + cx
    sy = src[1] / src[2] + cy

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return img[yi, xi] * inside[:, None]

    out = (tap(x0, y0) * ((1 - fx) * (1 - fy))[:, None]
           + tap(x0 + 1, y0) * (fx * (1 - fy))[:, None]
           + tap(x0, y0 + 1) * ((1 - fx) * fy)[:, None]
           + tap(x0 + 1, y0 + 1) * (fx * fy)[:, None])
    return out.reshape(H, W, -1)


# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    """Callable: ``pipe(images, rng, p)`` with images (B, H, W, C) in
    [-1, 1] and p the overall ADA probability (traced scalar ok)."""

    # pixel blitting
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    # geometric
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    # color
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # image-space filtering
    imgfilter: float = 0.0
    imgfilter_bands: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    # corruptions
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5

    def __call__(self, images: jnp.ndarray, rng: jax.Array,
                 p: jnp.ndarray | float = 1.0) -> jnp.ndarray:
        B, H, W, C = images.shape
        p = jnp.asarray(p, jnp.float32)
        keys = iter(jax.random.split(rng, 48))

        def gate(key, mult, value, off_value):
            """Apply ``value`` with probability mult*p per sample."""
            on = jax.random.uniform(key, (B,)) < mult * p
            return jnp.where(on.reshape((B,) + (1,) * (value.ndim - 1)),
                             value, off_value)

        # ---------------- geometric: compose forward G, invert once
        G = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        if self.xflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B,)) * 2)
            i = gate(next(keys), self.xflip, i, jnp.zeros_like(i))
            G = scale2d(1 - 2 * i, jnp.ones((B,))) @ G
        if self.rotate90 > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B,)) * 4)
            i = gate(next(keys), self.rotate90, i, jnp.zeros_like(i))
            G = rotate2d(-np.pi / 2 * i) @ G
        if self.xint > 0:
            t = (jax.random.uniform(next(keys), (B, 2)) * 2 - 1) * self.xint_max
            t = gate(next(keys), self.xint, t, jnp.zeros_like(t))
            G = translate2d(jnp.round(t[:, 0] * W), jnp.round(t[:, 1] * H)) @ G
        if self.scale > 0:
            s = 2.0 ** (jax.random.normal(next(keys), (B,)) * self.scale_std)
            s = gate(next(keys), self.scale, s, jnp.ones_like(s))
            G = scale2d(s, s) @ G
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - self.rotate * p, 0, 1))  # P(pre) = P(post)
        if self.rotate > 0:
            theta = (jax.random.uniform(next(keys), (B,)) * 2 - 1) \
                * np.pi * self.rotate_max
            on = jax.random.uniform(next(keys), (B,)) < p_rot
            G = rotate2d(-jnp.where(on, theta, 0.0)) @ G
        if self.aniso > 0:
            s = 2.0 ** (jax.random.normal(next(keys), (B,)) * self.aniso_std)
            s = gate(next(keys), self.aniso, s, jnp.ones_like(s))
            G = scale2d(s, 1.0 / s) @ G
        if self.rotate > 0:  # second rotation (augment.py: post-aniso)
            theta = (jax.random.uniform(next(keys), (B,)) * 2 - 1) \
                * np.pi * self.rotate_max
            on = jax.random.uniform(next(keys), (B,)) < p_rot
            G = rotate2d(-jnp.where(on, theta, 0.0)) @ G
        if self.xfrac > 0:
            t = jax.random.normal(next(keys), (B, 2)) * self.xfrac_std
            t = gate(next(keys), self.xfrac, t, jnp.zeros_like(t))
            G = translate2d(t[:, 0] * W, t[:, 1] * H) @ G

        geom_on = (self.xflip, self.rotate90, self.xint, self.scale,
                   self.rotate, self.aniso, self.xfrac)
        if any(v > 0 for v in geom_on):
            G_inv = jnp.linalg.inv(G)
            images = jax.vmap(_affine_sample)(images, G_inv)

        # ---------------- color: compose one 4x4 matrix in RGB-homogeneous
        Cm = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
        v_luma = jnp.asarray([1.0, 1.0, 1.0, 0.0]) / np.sqrt(3.0)
        if self.brightness > 0:
            b = jax.random.normal(next(keys), (B,)) * self.brightness_std
            b = gate(next(keys), self.brightness, b, jnp.zeros_like(b))
            Cm = translate3d(jnp.stack([b, b, b], -1)) @ Cm
        if self.contrast > 0:
            c = 2.0 ** (jax.random.normal(next(keys), (B,)) * self.contrast_std)
            c = gate(next(keys), self.contrast, c, jnp.ones_like(c))
            Cm = scale3d(jnp.stack([c, c, c], -1)) @ Cm
        if self.lumaflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B,)) * 2)
            i = gate(next(keys), self.lumaflip, i, jnp.zeros_like(i))
            house = jnp.eye(4) - 2.0 * jnp.outer(v_luma, v_luma)
            Cm = jnp.where(i[:, None, None] > 0.5, house @ Cm, Cm)
        if self.hue > 0 and C > 1:
            theta = (jax.random.uniform(next(keys), (B,)) * 2 - 1) \
                * np.pi * self.hue_max
            theta = gate(next(keys), self.hue, theta, jnp.zeros_like(theta))
            Cm = rotate3d(jnp.broadcast_to(v_luma[:3], (B, 3)), theta) @ Cm
        if self.saturation > 0 and C > 1:
            s = 2.0 ** (jax.random.normal(next(keys), (B,))
                        * self.saturation_std)
            s = gate(next(keys), self.saturation, s, jnp.ones_like(s))
            proj = jnp.outer(v_luma, v_luma)
            Cm = (proj[None] + (jnp.eye(4)[None] - proj[None])
                  * s[:, None, None]) @ Cm

        color_on = (self.brightness, self.contrast, self.lumaflip,
                    self.hue, self.saturation)
        if any(v > 0 for v in color_on):
            flat = images.reshape(B, -1, C)
            if C == 3:
                out = jnp.einsum("bij,bnj->bni", Cm[:, :3, :3], flat) \
                    + Cm[:, None, :3, 3]
            else:  # grayscale: average the RGB rows (augment.py grayscale path)
                m = Cm[:, :3, :].mean(1)
                out = flat * m[:, None, :1].sum(-1, keepdims=True) \
                    + m[:, None, 3:4]
            images = out.reshape(B, H, W, C)

        # ---------------- image-space filtering: 4 frequency bands
        if self.imgfilter > 0:
            bands = _freq_bands()
            amps = []
            for band_mult in self.imgfilter_bands:
                t = 2.0 ** (jax.random.normal(next(keys), (B,))
                            * self.imgfilter_std)
                on = jax.random.uniform(next(keys), (B,)) \
                    < self.imgfilter * p * band_mult
                amps.append(jnp.where(on, t, jnp.ones_like(t)))
            amps = jnp.stack(amps, -1)                        # (B, 4)
            # normalize so overall expected energy is preserved
            amps = amps / jnp.sqrt(jnp.mean(amps ** 2, axis=-1,
                                            keepdims=True))
            images = _apply_bands(images, bands, amps)

        # ---------------- corruptions
        if self.noise > 0:
            sigma = jnp.abs(jax.random.normal(next(keys), (B,))) \
                * self.noise_std
            on = jax.random.uniform(next(keys), (B,)) < self.noise * p
            sigma = jnp.where(on, sigma, 0.0)
            images = images + jax.random.normal(
                next(keys), images.shape) * sigma[:, None, None, None]
        if self.cutout > 0:
            center = jax.random.uniform(next(keys), (B, 2))
            on = jax.random.uniform(next(keys), (B,)) < self.cutout * p
            size = jnp.where(on, self.cutout_size, 0.0)
            ys = (jnp.arange(H) + 0.5) / H
            xs = (jnp.arange(W) + 0.5) / W
            my = jnp.abs(ys[None, :] - center[:, 1:2]) >= size[:, None] / 2
            mx = jnp.abs(xs[None, :] - center[:, 0:1]) >= size[:, None] / 2
            mask = (my[:, :, None] | mx[:, None, :]).astype(images.dtype)
            images = images * mask[..., None]
        return images


def _freq_bands() -> list:
    """Four separable band filters covering [0, pi/8], [pi/8, pi/4],
    [pi/4, pi/2], [pi/2, pi] (the reference builds these from the sym2
    wavelet bank; here an 8-tap binomial lowpass pyramid)."""
    # odd-length so every composed filter stays odd (symmetric padding)
    lo = np.array([1, 8, 28, 56, 70, 56, 28, 8, 1], np.float64)
    lo /= lo.sum()

    def upsample_filter(f, times):
        for _ in range(times):
            g = np.zeros(len(f) * 2 - 1)
            g[::2] = f
            g = np.convolve(g, [0.25, 0.5, 0.25])  # unit-DC interpolator
            f = g
        return f

    # lowpass[i] cuts at pi / 2^(3-i): lowpass[0] keeps only [0, pi/8]
    lowpass = [np.array([1.0])]
    for i in range(3):
        lowpass.append(np.convolve(lowpass[-1], upsample_filter(lo, i)))
    L = [lowpass[3], lowpass[2], lowpass[1], np.array([1.0])]
    full = len(L[0])
    Lp = [np.pad(f, ((full - len(f)) // 2,) * 2) for f in L]
    bands = [Lp[0], Lp[1] - Lp[0], Lp[2] - Lp[1], Lp[3] - Lp[2]]
    return [jnp.asarray(b, jnp.float32) for b in bands]


def _apply_bands(images: jnp.ndarray, bands, amps: jnp.ndarray) -> jnp.ndarray:
    """Filter (B,H,W,C) with sum_i amp_i * band_i (separable taps)."""
    B, H, W, C = images.shape
    out = jnp.zeros_like(images)
    for i, f in enumerate(bands):
        k = f.shape[0]
        pad = k // 2
        x = jnp.moveaxis(images, -1, 1).reshape(B * C, 1, H, W)
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
        fx = f.reshape(1, 1, 1, k)
        fy = f.reshape(1, 1, k, 1)
        x = jax.lax.conv_general_dilated(x, fx, (1, 1), "VALID")
        x = jax.lax.conv_general_dilated(x, fy, (1, 1), "VALID")
        x = jnp.moveaxis(x.reshape(B, C, H, W), 1, -1)
        out = out + x * amps[:, i][:, None, None, None]
    return out


def ada_adjust(p: float, rt: float, target: float, nimg_delta: int,
               ada_kimg: float = 500.0) -> float:
    """ADA feedback controller (reference training_loop.py:364-371):
    nudge p toward keeping E[sign(D(real))] at ``target``."""
    adjust = np.sign(rt - target) * nimg_delta / (ada_kimg * 1000.0)
    return float(np.clip(p + adjust, 0.0, 1.0))
