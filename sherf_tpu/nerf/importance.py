"""Hierarchical (importance) sampling along rays.

The reference's fine pass (renderer.py:374-393, sample_importance:483-501,
sample_pdf:503-542) is dead code in all shipped human configs
(depth_resolution_importance=0; the fine call site even has a stale
signature).  We implement it cleanly for API completeness and default it
off, matching the shipped behavior.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _smooth_weights(w: jnp.ndarray) -> jnp.ndarray:
    """max_pool1d(k=2, pad=1) then avg_pool1d(k=2) + 0.01
    (renderer.py:493-496)."""
    # torch max_pool1d with padding=1 pads with -inf; emulate exactly
    padded = jnp.concatenate(
        [jnp.full_like(w[:, :1], -jnp.inf), w, jnp.full_like(w[:, :1], -jnp.inf)],
        axis=-1)
    mx = jnp.maximum(padded[:, :-1], padded[:, 1:])
    avg = (mx[:, :-1] + mx[:, 1:]) / 2.0
    return avg + 0.01


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_importance: int,
               det: bool = False, eps: float = 1e-5,
               rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Inverse-CDF sampling (renderer.py:503-542).

    bins: (R, B+1) depth bin edges; weights: (R, B).  Returns (R, n_importance).
    """
    R, B = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, B+1)

    if det:
        u = jnp.tile(jnp.linspace(0.0, 1.0, n_importance)[None], (R, 1))
    else:
        assert rng is not None, "non-deterministic sample_pdf needs an rng"
        u = jax.random.uniform(rng, (R, n_importance))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, B)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)


def sample_importance(z_vals: jnp.ndarray, weights: jnp.ndarray,
                      n_importance: int, det: bool = True,
                      rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """(renderer.py:483-501).  z_vals: (R, D); weights: (R, D).
    Returns (R, n_importance) fine sample depths."""
    w = _smooth_weights(weights)
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    return sample_pdf(z_mid, w[:, 1:-1], n_importance, det=det, rng=rng)
