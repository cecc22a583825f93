"""Amortized re-measurement of the gather law (overhead-cancelled).

Run: python tools/profile_law2.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
from _timing import time_op


def main(N=524288, T=65536):
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    idx = jax.random.randint(key, (N,), 0, T)
    for C in (16, 64, 128, 256):
        tbl = jax.random.normal(key, (T, C), dt)
        time_op(lambda t, i: jnp.take(t, i, axis=0), tbl, idx,
                tag=f"raw gather 524k C={C} ({2 * C}B rows)")

    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d, grid_sample_2d_packed, grid_sample_2d_xpacked,
        pack_corners_2d, pack_x_2d)
    plane = jax.random.normal(key, (256, 256, 32), dt)
    uv = jax.random.uniform(key, (N, 2), minval=-1, maxval=1)
    time_op(lambda im, c: grid_sample_2d(im, c), plane, uv,
            tag="bilinear 32ch 4-tap")
    xp = jax.jit(pack_x_2d)(plane)
    time_op(lambda p, c: grid_sample_2d_xpacked(p, c), xp, uv,
            tag="bilinear 32ch x-pack 2-tap")
    fp = jax.jit(pack_corners_2d)(plane)
    time_op(lambda p, c: grid_sample_2d_packed(p, c), fp, uv,
            tag="bilinear 32ch full-pack 1-tap")


if __name__ == "__main__":
    main()
