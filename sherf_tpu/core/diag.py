"""Runtime diagnostics for the static-capacity budgets.

The TPU-native renderer replaces the reference's dynamic boolean indexing
(renderer.py:315-321) with static-capacity compaction; samples beyond a
budget are silently dropped.  Every truncation point sows its overflow
count (survivors - capacity, clamped at 0) into the flax 'diag' collection:

  renderer: ray_overflow / point_overflow / exact_overflow
  encoder_3d downsamples: site_overflow

Read them with ``out, mvars = model.apply(vars, ..., mutable=["diag"])``.
A nonzero count means real body samples were dropped — recalibrate with
``core.calibrate`` at a larger margin.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import traverse_util


def overflow_report(diag: Dict) -> Dict[str, int]:
    """Flatten a 'diag' collection into {leaf_name: max count} (host ints)."""
    out: Dict[str, int] = {}
    for path, leaf in traverse_util.flatten_dict(diag).items():
        name = str(path[-1])
        out[name] = max(out.get(name, 0), int(jnp.max(jnp.asarray(leaf))))
    return out


def overflow_total(diag: Dict) -> jnp.ndarray:
    """Total overflow as a traced f32 scalar (for metrics dicts)."""
    leaves = [jnp.sum(jnp.asarray(v, jnp.float32))
              for v in traverse_util.flatten_dict(diag).values()]
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return sum(leaves)
