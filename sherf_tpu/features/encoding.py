"""NeRF positional encoding (reference renderer.PositionalEncoding,
renderer.py:875-916).

Output layout matches the reference exactly:
  [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]
where each sin/cos block covers all input dims and f_k = 2^k
(freqs = 2^linspace(0, num_freqs-1)).

Direct sin/cos evaluation in the natural layout: a double-angle
recurrence variant (sin 2a = 2 sin a cos a) was used in rounds 1-2, but
its channel-major intermediate forces a (P, N, d) -> (N, P*d) transpose
with a tiny minor dimension that dominates at the compacted point counts
(measured 2.8 s (!) vs 4 ms direct for the production trio of encodings
at 196k points on v5e — the transcendentals were never the cost).
``exact`` is kept for API compatibility; both paths are identical now.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_freqs: int,
                        include_input: bool = True,
                        exact: bool = False) -> jnp.ndarray:
    """x: (..., d) -> (..., d * 2 * num_freqs [+ d])."""
    del exact  # one path: direct evaluation (see module docstring)
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    parts = [x] if include_input else []
    for f in freqs:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)
