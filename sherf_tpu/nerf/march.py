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
