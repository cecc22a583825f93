"""NeRF positional encoding (reference renderer.PositionalEncoding,
renderer.py:875-916).

Output layout matches the reference exactly:
  [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]
where each sin/cos block covers all input dims and f_k = 2^k
(freqs = 2^linspace(0, num_freqs-1)).

Default path: ONE broadcast multiply-add and ONE sin over a (..., 6Fd)
tensor built directly in the reference part order, using
sin(a + pi/2) = cos(a) to fold the cosine blocks into the same sine call.
Per-frequency direct evaluation (r2-r4) emitted ~2 dozen tiny ops on
(..., d=3) tensors whose sine/convert fusions traced ~4.8-5.3 ms of the
production frame — the cost was per-op overhead at a tiny minor dim, not
transcendental throughput, so the fix is op-count collapse, not a cheaper
sine.  (A rounds-1-2 double-angle recurrence variant had the same
many-small-ops shape and its channel-major intermediate transposed at
2.8 s (!); a sequential recurrence re-tried in r5 still traced ~5.3 ms
for the same reason.)  ``exact=True`` keeps per-frequency direct
evaluation as the oracle; the folded form equals it to f32 rounding
(test_features.py::test_positional_encoding_recurrence_matches_exact).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_freqs: int,
                        include_input: bool = True,
                        exact: bool = False) -> jnp.ndarray:
    """x: (..., d) -> (..., d * 2 * num_freqs [+ d])."""
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    if exact:
        parts = [x] if include_input else []
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)
    d = x.shape[-1]
    # column k of the (2F*d,) tables: part p = k // d covers frequency
    # f_{p//2}, sine for even p / cosine (phase pi/2) for odd p — exactly
    # the reference layout [sin(f0 x), cos(f0 x), sin(f1 x), ...]
    fcol = np.repeat(freqs, 2 * d).astype(np.float32)
    pcol = np.tile(np.repeat(np.asarray([0.0, np.pi / 2], np.float32), d),
                   num_freqs)
    xt = jnp.concatenate([x] * (2 * num_freqs), axis=-1)
    enc = jnp.sin(xt * fcol + pcol)
    if include_input:
        return jnp.concatenate([x, enc], axis=-1)
    return enc
