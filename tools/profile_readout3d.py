"""3D readout strategy per scale: dense 8-tap vs x-pack vs index-grid
site sampling (no dense feature grid at all).

Includes the per-application cost of building whatever structure each
variant needs (dense grid / packed grid / index grid), as in production.

Run: python tools/profile_readout3d.py  (alone)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _timing import time_op  # noqa: E402


def main(N=262144):
    from sherf_tpu.features.sparseconv import (
        build_index_grid, trilinear_dense_sample, trilinear_dense_sample_x,
        trilinear_site_sample)

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    for shape, C in (((48, 160, 176), 32), ((24, 80, 88), 64),
                     ((12, 40, 44), 96)):
        S = 8192
        rs = np.random.RandomState(0)
        coords = jnp.asarray(np.stack(
            [rs.randint(0, s, S) for s in shape], -1).astype(np.int32))
        valid = jnp.ones((S,), bool)
        feats = jax.random.normal(key, (S, C), dt)
        pos = jax.random.uniform(key, (N, 3), minval=0.0,
                                 maxval=float(min(shape) - 2))
        time_op(lambda f, c, p: trilinear_dense_sample(f, c, valid, shape, p),
                feats, coords, pos, tag=f"C={C} {shape}: dense 8-tap")
        time_op(lambda f, c, p: trilinear_dense_sample_x(
            f, c, valid, shape, p), feats, coords, pos,
            tag=f"C={C} {shape}: dense x-pack 4-tap")

        def site(f, c, p):
            grid = build_index_grid(c, valid, shape)
            return trilinear_site_sample(f, grid, shape, p)

        time_op(site, feats, coords, pos,
                tag=f"C={C} {shape}: index-grid site 8x2-tap")


if __name__ == "__main__":
    main()
