"""Choose the tap/packing scheme per texture at production sizes.

Amortized, realistic table sizes, 262k queries (the post-exact-compaction
budget): 2D 4-tap vs x-pack(2) vs full-pack(1); 3D 8-tap dense vs
x-pack(4) vs xy-pack(2), per readout scale.

Run: python tools/profile_pack_variants.py  (alone — one TPU user at a time)
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
    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d, grid_sample_2d_packed, grid_sample_2d_xpacked,
        pack_corners_2d, pack_x_2d)
    from sherf_tpu.features.sparseconv import (
        trilinear_dense_sample, trilinear_dense_sample_x,
        trilinear_dense_sample_xy)

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    uv = jax.random.uniform(key, (N, 2), minval=-1, maxval=1)

    for H, W, C, name in ((256, 256, 32, "plane32"),
                          (256, 256, 64, "obs_feat64"),
                          (512, 512, 3, "obs_rgb3")):
        img = jax.random.normal(key, (H, W, C), dt)
        time_op(lambda im, c: grid_sample_2d(im, c, True), img, uv,
                tag=f"2D {name}: 4-tap")
        time_op(lambda im, c: grid_sample_2d_xpacked(pack_x_2d(im), c, True),
                img, uv, tag=f"2D {name}: x-pack 2-tap (incl pack)")
        time_op(lambda im, c: grid_sample_2d_packed(
            pack_corners_2d(im), c, True), img, uv,
            tag=f"2D {name}: full-pack 1-tap (incl pack)")

    # 3D readout scales (production out_sh (96,320,352) at 1/2, 1/4, 1/8)
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
                feats, coords, pos, tag=f"3D C={C} {shape}: 8-tap")
        time_op(lambda f, c, p: trilinear_dense_sample_x(
            f, c, valid, shape, p), feats, coords, pos,
            tag=f"3D C={C} {shape}: x-pack 4-tap")
        time_op(lambda f, c, p: trilinear_dense_sample_xy(
            f, c, valid, shape, p), feats, coords, pos,
            tag=f"3D C={C} {shape}: xy-pack 2-tap")


if __name__ == "__main__":
    main()
