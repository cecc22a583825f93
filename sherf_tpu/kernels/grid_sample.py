"""Gather-based bilinear / trilinear grid sampling.

TPU replacement for ``torch.nn.functional.grid_sample`` as used by the
reference for triplane lookup (renderer.py:234-243), pixel-aligned feature
lookup (renderer.py:333-336, triplane.py:115-118) and sparse-volume readout
(renderer.py:764-791).  Implemented as clipped gathers + in-bounds masks
(zeros padding) so shapes stay static under jit.

Random row gathers are latency-bound on TPU (~10-16ns per row regardless of
width — measured on v5e), so the hot paths use CORNER-PACKED textures:
``pack_corners_2d`` widens the image to 4C channels holding the full 2x2
bilinear neighborhood of each texel, and ``grid_sample_2d_packed`` then
needs ONE gather per sample instead of four.  Numerics are identical to the
4-tap path (same taps, same zero padding).

Coordinates are in [-1, 1], xy(z) order: x indexes the LAST spatial axis
(W), matching torch's convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_corners_2d(img, ix, iy):
    """img: (H, W, C); ix, iy: (N,) int32 (may be out of bounds)."""
    H, W, _ = img.shape
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    flat = img.reshape(H * W, -1)
    vals = jnp.take(flat, iyc * W + ixc, axis=0)
    ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    return vals * ok[:, None].astype(vals.dtype)


def grid_sample_2d(img: jnp.ndarray, coords: jnp.ndarray,
                   align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample with zeros padding.

    img: (H, W, C); coords: (N, 2) normalized (x, y).  Returns (N, C).
    """
    x = _unnormalize(coords[:, 0], img.shape[1], align_corners)
    y = _unnormalize(coords[:, 1], img.shape[0], align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0.astype(x.dtype))[:, None]
    wy = (y - y0.astype(y.dtype))[:, None]

    v00 = _gather_corners_2d(img, x0, y0)
    v01 = _gather_corners_2d(img, x1, y0)
    v10 = _gather_corners_2d(img, x0, y1)
    v11 = _gather_corners_2d(img, x1, y1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def pack_corners_2d(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, 4C): channels [k*C:(k+1)*C] hold
    img[y + k//2, x + k%2] with zeros beyond the edges."""
    H, W, C = img.shape
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    return jnp.concatenate([
        p[:H, :W], p[:H, 1:W + 1], p[1:H + 1, :W], p[1:H + 1, 1:W + 1],
    ], axis=-1)


def grid_sample_2d_packed(packed: jnp.ndarray, coords: jnp.ndarray,
                          align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample from a corner-packed image — one row gather per
    point.  packed: (H, W, 4C) from :func:`pack_corners_2d`; coords: (N, 2)
    normalized (x, y).  Returns (N, C).  Matches grid_sample_2d exactly."""
    H, W, C4 = packed.shape
    C = C4 // 4
    x = _unnormalize(coords[:, 0], W, align_corners)
    y = _unnormalize(coords[:, 1], H, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = (x - x0.astype(x.dtype))[:, None].astype(packed.dtype)
    wy = (y - y0.astype(y.dtype))[:, None].astype(packed.dtype)

    # one gather at the clipped base texel; its 4 channel groups cover all
    # corners we might need (when x0/y0 sit just outside, the needed
    # in-bounds corner lives in a lower group of the clipped base).  The
    # per-corner group remap folds into per-group weights.
    bx = jnp.clip(x0, 0, W - 1)
    by = jnp.clip(y0, 0, H - 1)
    rows = jnp.take(packed.reshape(H * W, C4), by * W + bx, axis=0)
    rows = rows.reshape(-1, 4, C)

    wgrp = jnp.zeros((coords.shape[0], 4), packed.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            cx = x0 + dx
            cy = y0 + dy
            ok = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
            g = jnp.clip(cy - by, 0, 1) * 2 + jnp.clip(cx - bx, 0, 1)
            w = (wx if dx else 1 - wx) * (wy if dy else 1 - wy)
            onehot = (g[:, None] == jnp.arange(4)[None, :]).astype(
                packed.dtype)
            wgrp = wgrp + onehot * (w[:, 0] * ok.astype(packed.dtype))[:, None]
    return jnp.einsum("nk,nkc->nc", wgrp, rows)


def pack_x_2d(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, 2C): channels [0:C] = img[y, x], [C:2C] =
    img[y, x+1] (zeros past the right edge).

    Row-gather cost on TPU is ~flat up to ~128-byte rows, then grows with
    width; x-only packing halves the tap count of bilinear sampling while
    keeping rows narrow (<=64ch bf16), where the full 4-corner pack's 4C
    rows already pay the width tax."""
    H, W, _ = img.shape
    p = jnp.pad(img, ((0, 0), (0, 1), (0, 0)))
    return jnp.concatenate([p[:, :W], p[:, 1:W + 1]], axis=-1)


def grid_sample_2d_xpacked(packed: jnp.ndarray, coords: jnp.ndarray,
                           align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample from an x-packed image — two row gathers per point
    (one per y corner).  packed: (H, W, 2C) from :func:`pack_x_2d`;
    coords: (N, 2) normalized (x, y).  Matches grid_sample_2d exactly."""
    H, W, C2 = packed.shape
    C = C2 // 2
    x = _unnormalize(coords[:, 0], W, align_corners)
    y = _unnormalize(coords[:, 1], H, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    # weights stay f32 (matching grid_sample_2d's promotion semantics)
    wx = x - x0.astype(x.dtype)
    wy = (y - y0.astype(y.dtype))[:, None]

    # x-group weights at the clipped base column (handles x0 == -1, where
    # the needed in-bounds corner x1 = 0 sits in group 0 of base 0)
    bx = jnp.clip(x0, 0, W - 1)
    okx0 = ((x0 >= 0) & (x0 < W)).astype(x.dtype)
    okx1 = ((x1 >= 0) & (x1 < W)).astype(x.dtype)
    g0 = ((1 - wx) * okx0 * (x0 == bx) + wx * okx1 * (x1 == bx))[:, None]
    g1 = ((1 - wx) * okx0 * (x0 == bx + 1)
          + wx * okx1 * (x1 == bx + 1))[:, None]

    flat = packed.reshape(H * W, C2)

    def row_term(yc):
        oky = ((yc >= 0) & (yc < H))[:, None].astype(x.dtype)
        rows = jnp.take(flat, jnp.clip(yc, 0, H - 1) * W + bx, axis=0)
        return (rows[:, :C] * g0 + rows[:, C:] * g1) * oky

    return row_term(y0) * (1 - wy) + row_term(y1) * wy


def grid_sample_2d_xpacked_wg(packed: jnp.ndarray, coords: jnp.ndarray,
                              align_corners: bool = False) -> jnp.ndarray:
    """:func:`grid_sample_2d_xpacked` routed through
    ``paired_weighted_gather`` so the TABLE gradient uses the tuned
    multi-hot MXU adjoint instead of XLA's duplicate-heavy scatter-add
    (measured ~14 ms/step on the production train step's obs-feature
    backward).  The weights' cotangents are declared dead — sampling
    coordinates derive from ray/SMPL geometry (pure data), never from
    parameters.  Forward numerics: same taps, same zero padding; the two
    x-corner contributions of each y row are combined in the same order.
    """
    from sherf_tpu.kernels.segment_accum import paired_weighted_gather

    H, W, C2 = packed.shape
    x = _unnormalize(coords[:, 0], W, align_corners)
    y = _unnormalize(coords[:, 1], H, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0.astype(x.dtype)
    wy = y - y0.astype(y.dtype)

    bx = jnp.clip(x0, 0, W - 1)
    okx0 = ((x0 >= 0) & (x0 < W)).astype(x.dtype)
    okx1 = ((x1 >= 0) & (x1 < W)).astype(x.dtype)
    g0 = (1 - wx) * okx0 * (x0 == bx) + wx * okx1 * (x1 == bx)
    g1 = (1 - wx) * okx0 * (x0 == bx + 1) + wx * okx1 * (x1 == bx + 1)

    flat = packed.reshape(H * W, C2)
    # row 0 doubles as the zero row for out-of-bounds y taps: out-of-bounds
    # rows get zero WEIGHTS, so aliasing id 0 is harmless (and its real
    # gradient contribution keeps id 0 when in bounds)
    ids, was, wbs = [], [], []
    for yc, wrow in ((y0, 1 - wy), (y1, wy)):
        oky = ((yc >= 0) & (yc < H)).astype(x.dtype)
        ids.append(jnp.clip(yc, 0, H - 1) * W + bx)
        was.append(g0 * wrow * oky)
        wbs.append(g1 * wrow * oky)
    out = paired_weighted_gather(
        flat, jnp.stack(ids, axis=-1),
        jnp.stack(was, axis=-1).astype(jnp.float32),
        jnp.stack(wbs, axis=-1).astype(jnp.float32),
        force_multihot=True)
    return out.astype(packed.dtype)


def _gather_corners_3d(vol, ix, iy, iz):
    """vol: (D, H, W, C); indices (N,) int32."""
    D, H, W, _ = vol.shape
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    izc = jnp.clip(iz, 0, D - 1)
    flat = vol.reshape(D * H * W, -1)
    vals = jnp.take(flat, (izc * H + iyc) * W + ixc, axis=0)
    ok = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
    return vals * ok[:, None].astype(vals.dtype)


def grid_sample_3d(vol: jnp.ndarray, coords: jnp.ndarray,
                   align_corners: bool = True) -> jnp.ndarray:
    """Trilinear sample with zeros padding.

    vol: (D, H, W, C); coords: (N, 3) normalized (x, y, z) where x indexes W,
    y indexes H, z indexes D (torch grid_sample 5D convention).
    Returns (N, C).
    """
    x = _unnormalize(coords[:, 0], vol.shape[2], align_corners)
    y = _unnormalize(coords[:, 1], vol.shape[1], align_corners)
    z = _unnormalize(coords[:, 2], vol.shape[0], align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
    wx = (x - x0.astype(x.dtype))[:, None]
    wy = (y - y0.astype(y.dtype))[:, None]
    wz = (z - z0.astype(z.dtype))[:, None]

    def corner(ix, iy, iz):
        return _gather_corners_3d(vol, ix, iy, iz)

    c000 = corner(x0, y0, z0)
    c001 = corner(x1, y0, z0)
    c010 = corner(x0, y1, z0)
    c011 = corner(x1, y1, z0)
    c100 = corner(x0, y0, z1)
    c101 = corner(x1, y0, z1)
    c110 = corner(x0, y1, z1)
    c111 = corner(x1, y1, z1)

    f0 = (c000 * (1 - wx) + c001 * wx) * (1 - wy) + (c010 * (1 - wx) + c011 * wx) * wy
    f1 = (c100 * (1 - wx) + c101 * wx) * (1 - wy) + (c110 * (1 - wx) + c111 * wx) * wy
    return f0 * (1 - wz) + f1 * wz
