"""Alpha-compositing ray marcher (reference MipRayMarcher2,
ray_marcher.py:20-70).

Deltas are scaled by the UNNORMALIZED ray direction norm, the final delta is
1e10, densities clamp via relu (shipped configs) or softplus(x-1), and the
composited rgb is rescaled to (-1, 1).  Everything is elementwise + one
cumulative product — XLA fuses it into the surrounding computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_march(colors: jnp.ndarray, densities: jnp.ndarray, depths: jnp.ndarray,
              rays_d: jnp.ndarray, clamp_mode: str = "relu",
              white_back: bool = False):
    """colors: (N, D, 3); densities: (N, D); depths: (N, D); rays_d: (N, 3).

    Returns (rgb (N, 3) in (-1, 1), depth (N,), weights (N, D)).
    """
    deltas = depths[:, 1:] - depths[:, :-1]
    deltas = jnp.concatenate([deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1)
    deltas = deltas * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if clamp_mode == "softplus":
        sigma = jax.nn.softplus(densities - 1.0)
    elif clamp_mode == "relu":
        sigma = jax.nn.relu(densities)
    else:
        raise ValueError(f"unsupported clamp_mode {clamp_mode!r}")

    alpha = 1.0 - jnp.exp(-sigma * deltas)
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-10], axis=-1)
    weights = alpha * jnp.cumprod(shifted, axis=-1)[:, :-1]

    rgb = jnp.sum(weights[..., None] * colors, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * depths, axis=-1) / acc
    depth = jnp.nan_to_num(depth, nan=jnp.inf)
    depth = jnp.clip(depth, jnp.min(depths), jnp.max(depths))

    if white_back:
        rgb = rgb + (1.0 - acc)[..., None]
    rgb = rgb * 2.0 - 1.0
    return rgb, depth, weights


def ray_march_segmented(colors: jnp.ndarray,       # (P, 3) compacted points
                        densities: jnp.ndarray,    # (P,)
                        gidx: jnp.ndarray,         # (P,) int, ASCENDING flat
                        #      sample index ray*D + k (stable compaction)
                        valid: jnp.ndarray,        # (P,) bool — MUST be a
                        #      prefix (True... then False...), as produced by
                        #      stable compaction; masking of individual
                        #      interior points must go through densities
                        #      (sigma -80 -> clamp -> 0), not this flag
                        near: jnp.ndarray,         # (N,) per ray
                        far: jnp.ndarray,          # (N,)
                        rays_d: jnp.ndarray,       # (N, 3)
                        depth_resolution: int,
                        clamp_mode: str = "relu",
                        white_back: bool = False,
                        depth_clip=None):   # optional (lo, hi) scalars —
                        #   pass the FULL ray set's (min near, max far) when
                        #   marching a compacted ray subset so the empty-ray
                        #   depth convention matches the dense path
    """Composite the compacted survivor points directly — no scatter back to
    the dense (N, D) sample grid.

    Exactly equivalent to scattering the points into the (N, D) grid with
    density -80 at the holes and running :func:`ray_march` (the reference
    semantics, renderer.py:364-371 + ray_marcher.py): on the uniform
    stratified grid every sample's delta is (far-near)/(D-1)*|d| (1e10 for
    the last slot), so alpha is per-point computable, and the transmittance
    is a segmented product over each ray's surviving points, which are
    already contiguous and depth-ordered because the compaction is stable.
    Holes (sigma->relu->0) multiply transmittance by 1 and are skipped for
    free.  (The dense marcher's +1e-10 cumprod guard adds <=D*1e-10 of
    transmittance per ray; here the guard is clamped to exact 1 — far below
    render precision.)

    Returns (rgb (N, 3) in (-1, 1), depth (N,), acc (N,)).
    """
    N = near.shape[0]
    D = depth_resolution
    colors = colors.astype(jnp.float32)
    densities = densities.astype(jnp.float32)
    near = near.astype(jnp.float32)
    far = far.astype(jnp.float32)

    ray = gidx // D
    k = gidx % D
    seg = jnp.where(valid, ray, N)          # invalid -> dropped segment

    # per-ray quantities in one packed gather row
    dnorm = jnp.linalg.norm(rays_d, axis=-1)
    table = jnp.stack([near, far, dnorm], axis=-1)          # (N, 3)
    rows = jnp.take(table, jnp.minimum(ray, N - 1), axis=0)
    near_p, far_p, dn_p = rows[:, 0], rows[:, 1], rows[:, 2]

    step = (far_p - near_p) / (D - 1)
    depth_p = near_p + step * k.astype(near_p.dtype)
    delta = jnp.where(k == D - 1, 1e10, step) * dn_p

    if clamp_mode == "softplus":
        sigma = jax.nn.softplus(densities - 1.0)
    elif clamp_mode == "relu":
        sigma = jax.nn.relu(densities)
    else:
        raise ValueError(f"unsupported clamp_mode {clamp_mode!r}")
    sigma = jnp.where(valid, sigma, 0.0)

    one_m_alpha = jnp.exp(-sigma * delta)
    alpha = 1.0 - one_m_alpha
    # log-transmittance contribution; the +1e-10 matches the dense marcher's
    # cumprod guard and bounds the log at ~-23 (no -inf when alpha == 1);
    # clamp to <= 0 (see guard note above)
    logt = jnp.minimum(jnp.log(one_m_alpha + 1e-10), 0.0)

    # segmented exclusive prefix sum: global cumsum minus the value at the
    # segment start.  s is non-increasing, so the latest start's value is
    # the running minimum over start values.
    s = jnp.concatenate([jnp.zeros((1,), logt.dtype),
                         jnp.cumsum(logt)[:-1]])           # exclusive
    is_start = jnp.concatenate([jnp.ones((1,), bool), seg[1:] != seg[:-1]])
    start_vals = jnp.where(is_start, s, jnp.inf)
    s_start = jax.lax.associative_scan(jnp.minimum, start_vals)
    trans = jnp.exp(s - s_start)

    w = alpha * trans * valid.astype(alpha.dtype)

    rgb = jax.ops.segment_sum(w[:, None] * colors, seg, num_segments=N)
    acc = jax.ops.segment_sum(w, seg, num_segments=N)
    wd = jax.ops.segment_sum(w * depth_p, seg, num_segments=N)

    lo, hi = depth_clip if depth_clip is not None else (jnp.min(near),
                                                       jnp.max(far))
    depth = wd / acc
    depth = jnp.nan_to_num(depth, nan=jnp.inf)
    depth = jnp.clip(depth, lo, hi)

    if white_back:
        rgb = rgb + (1.0 - acc)[..., None]
    rgb = rgb * 2.0 - 1.0
    return rgb, depth, acc
