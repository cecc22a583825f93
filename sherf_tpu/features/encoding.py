"""NeRF positional encoding (reference renderer.PositionalEncoding,
renderer.py:875-916).

Output layout matches the reference exactly:
  [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]
where each sin/cos block covers all input dims and f_k = 2^k
(freqs = 2^linspace(0, num_freqs-1)).

Default path: double-angle recurrence emitted SEQUENTIALLY in the
natural part order (sin 2a = 2 sin a cos a, cos 2a = 1 - 2 sin^2 a) — one
transcendental pair total instead of one per frequency, and zero layout
churn because each (..., d) part lands directly in its concat slot.  (A
rounds-1-2 recurrence variant vectorized over frequencies first and its
channel-major (P, N, d) intermediate forced a transpose with a tiny minor
dim that measured 2.8 s (!) at 196k points; the sequential form has no
such intermediate.  Direct evaluation shipped r2-r4 and its sine/convert
fusions traced 4.8 ms of the production frame.)  ``exact=True`` selects
direct sin/cos evaluation; the recurrence tracks it to <2e-5 absolute
(test_features.py::test_positional_encoding_recurrence_matches_exact),
invisible under the decoder's bf16 input casts.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_freqs: int,
                        include_input: bool = True,
                        exact: bool = False) -> jnp.ndarray:
    """x: (..., d) -> (..., d * 2 * num_freqs [+ d])."""
    parts = [x] if include_input else []
    if exact:
        freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)
    s, c = jnp.sin(x), jnp.cos(x)
    parts += [s, c]
    for _ in range(num_freqs - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        parts += [s, c]
    return jnp.concatenate(parts, axis=-1)
