"""Does vmap over a unit batch dim pessimize the hot stages?

The renderer lifts every per-sample stage with jax.vmap / nn.vmap over the
batch axis (B=1 in the flagship render).  XLA lowers batched gather/scatter
differently from their unbatched forms; this measures the factor on each
hot stage at production sizes.

Run: python tools/profile_vmap.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _timing import time_op  # noqa: E402


def main(cap=524288):
    from sherf_tpu.core.types import SMPLPose
    from sherf_tpu.features.sparseconv import (
        SparseConvNet, prepare_voxel_volume, world_to_voxel_f)
    from sherf_tpu.kernels.knn import nn_1_tables
    from sherf_tpu.nerf.warp import make_pose_context, target2c_tables
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts, joints = smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                   jnp.asarray(bp["shapes"]))
    min_dhw, out_sh = prepare_voxel_volume(np.asarray(t_verts))

    can = jax.random.uniform(key, (cap, 3), minval=-1.0, maxval=1.0)
    verts = jnp.asarray(t_verts)

    # ---- KNN+tables: unbatched vs vmap(B=1)
    ctx = make_pose_context(smpl, SMPLPose(
        poses=jnp.asarray(bp["poses"]), shapes=jnp.asarray(bp["shapes"]),
        R=jnp.eye(3), Th=jnp.zeros(3)))
    tab = target2c_tables(smpl, ctx, ctx)
    time_op(lambda q, v, t: nn_1_tables(q, v, t)[2], can, verts, tab,
            tag="nn_1_tables unbatched")
    time_op(lambda q, v, t: jax.vmap(nn_1_tables)(q, v, t)[2],
            can[None], verts[None], tab[None],
            tag="nn_1_tables vmap B=1")

    # ---- SparseConvNet: unbatched vs nn.vmap(B=1)
    S = 8192
    vol_feats = jax.random.normal(key, (S, 32), dt)
    vcoords = jnp.asarray(
        np.stack([np.random.RandomState(0).randint(0, s, S)
                  for s in out_sh], -1).astype(np.int32))
    qdhw = world_to_voxel_f(can, jnp.asarray(min_dhw))

    scn = SparseConvNet(num_layers=4, out_sh=out_sh, caps=(8192, 8192, 8192),
                        dtype=dt)
    sv = scn.init(key, vol_feats, vcoords, qdhw)
    time_op(lambda v, f, c, q: scn.apply(v, f, c, q), sv, vol_feats, vcoords,
            qdhw, tag="SparseConvNet unbatched")

    vscn = nn.vmap(SparseConvNet, in_axes=(0, 0, 0), out_axes=0,
                   variable_axes={"params": None, "batch_stats": None},
                   split_rngs={"params": False})(
        num_layers=4, out_sh=out_sh, caps=(8192, 8192, 8192), dtype=dt)
    vsv = vscn.init(key, vol_feats[None], vcoords[None], qdhw[None])
    time_op(lambda v, f, c, q: vscn.apply(v, f, c, q), vsv, vol_feats[None],
            vcoords[None], qdhw[None], tag="SparseConvNet nn.vmap B=1")

    # ---- x-packed bilinear: unbatched vs vmap(B=1)
    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d_xpacked, pack_x_2d)
    img = jax.random.normal(key, (512, 512, 64), dt)
    uv = jax.random.uniform(key, (cap, 2), minval=-1, maxval=1)
    time_op(lambda im, c: grid_sample_2d_xpacked(pack_x_2d(im), c, True),
            img, uv, tag="xpacked sample unbatched")
    time_op(lambda im, c: jax.vmap(
        lambda i, cc: grid_sample_2d_xpacked(pack_x_2d(i), cc, True))(im, c),
        img[None], uv[None], tag="xpacked sample vmap B=1")

    # ---- segmented march: unbatched vs vmap(B=1)
    from sherf_tpu.nerf.march import ray_march_segmented
    Nrays, D = 98304, 48
    gidx = jnp.sort(jax.random.randint(key, (cap,), 0, Nrays * D))
    valid = jnp.ones((cap,), bool)
    colors = jax.random.uniform(key, (cap, 3))
    dens = jax.random.uniform(key, (cap,), minval=-1, maxval=1)
    near = jnp.full((Nrays,), 0.5)
    far = jnp.full((Nrays,), 2.5)
    rays_d = jax.random.normal(key, (Nrays, 3))
    time_op(lambda c, s, g, v: ray_march_segmented(
        c, s, g, v, near, far, rays_d, D), colors, dens, gidx, valid,
        tag="segmented march unbatched")
    time_op(lambda c, s, g, v: jax.vmap(
        lambda cc, ss, gg, vv: ray_march_segmented(
            cc, ss, gg, vv, near, far, rays_d, D))(c, s, g, v),
        colors[None], dens[None], gidx[None], valid[None],
        tag="segmented march vmap B=1")

    # ---- capsule prune vmap factor
    from sherf_tpu.kernels.capsules import prune_mask
    M = 4718592
    pts = jax.random.uniform(key, (M, 3), minval=-1.2, maxval=1.2)
    time_op(lambda p: prune_mask(p, verts, joints, smpl, 0.05), pts,
            tag="capsule prune unbatched")
    time_op(lambda p: jax.vmap(
        lambda pp: prune_mask(pp, verts, joints, smpl, 0.05))(p), pts[None],
        tag="capsule prune vmap B=1")


if __name__ == "__main__":
    main()
