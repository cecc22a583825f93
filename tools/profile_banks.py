"""Amortized timing of each feature bank AS COMPOSED in the frame.

The single-dispatch frame ablations attribute ~116/157ms to the 2D/3D
banks, while their isolated kernels sum to ~25ms — this tool times each
bank end-to-end (everything between the compacted canonical points and the
fused per-point features) to find where the composition loses time.

Run: python tools/profile_banks.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _timing import time_op  # noqa: E402


def main(H=512, W=512, cap=524288):
    from sherf_tpu.core.config import ModelConfig
    from sherf_tpu.core.types import SMPLPose
    from sherf_tpu.features.encoding import positional_encoding
    from sherf_tpu.features.sparseconv import (
        SparseConvNet, prepare_voxel_volume, world_to_voxel_f)
    from sherf_tpu.features.transformer import PlaneTransformer
    from sherf_tpu.geometry.rays import project_points
    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d_xpacked, pack_x_2d)
    from sherf_tpu.kernels.knn import nn_1_tables
    from sherf_tpu.nerf.renderer import sample_from_planes
    from sherf_tpu.nerf.warp import (
        make_pose_context, c2source_tables, deform_c2source_from_tables)
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts, joints = smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                   jnp.asarray(bp["shapes"]))
    min_dhw, out_sh = prepare_voxel_volume(np.asarray(t_verts))
    print(f"out_sh={out_sh} cap={cap}", file=sys.stderr)

    can = jax.random.uniform(key, (cap, 3), minval=-1.0, maxval=1.0)
    ctx = make_pose_context(smpl, SMPLPose(
        poses=jnp.asarray(bp["poses"]), shapes=jnp.asarray(bp["shapes"]),
        R=jnp.eye(3), Th=jnp.zeros(3)))

    # ---- 1D: triplane
    planes = jax.random.normal(key, (3, 256, 256, 32), dt)
    time_op(lambda p, c: sample_from_planes(p, c), planes, can,
            tag="1D bank: triplane sample (x-packed)")

    # ---- 2D bank: c2s tables + KNN + warp + project + 2 samples + posenc
    obs_feat = jax.random.normal(key, (256, 256, 64), dt)
    obs_img = jax.random.uniform(key, (H, W, 3)).astype(dt)
    K = jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    R = jnp.eye(3)
    T = jnp.zeros((3, 1))

    def bank2d(can, of, oi):
        tab = c2source_tables(smpl, ctx, ctx)
        _, _, pay = nn_1_tables(can, jnp.asarray(t_verts), tab)
        _, world_src, _ = deform_c2source_from_tables(ctx, ctx, pay, can)
        uv, _ = project_points(world_src, K, R, T)
        wh = jnp.asarray([W, H], jnp.float32)
        uv_n = 2.0 * uv / wh - 1.0
        pf = grid_sample_2d_xpacked(pack_x_2d(of), uv_n, align_corners=True)
        pr = grid_sample_2d_xpacked(pack_x_2d(oi), uv_n, align_corners=True)
        rgb_feat = positional_encoding(pr, 5)[..., :32]
        return jnp.concatenate([pf, rgb_feat], axis=-1)

    time_op(bank2d, can, obs_feat, obs_img, tag="2D bank: full chain")

    def bank2d_nosample(can, of, oi):
        tab = c2source_tables(smpl, ctx, ctx)
        _, _, pay = nn_1_tables(can, jnp.asarray(t_verts), tab)
        _, world_src, _ = deform_c2source_from_tables(ctx, ctx, pay, can)
        uv, _ = project_points(world_src, K, R, T)
        return uv

    time_op(bank2d_nosample, can, obs_feat, obs_img,
            tag="2D bank: KNN+warp+project only")

    # ---- 3D bank: SparseConvNet conv stack + 3-scale readout
    S = 8192
    vol_feats = jax.random.normal(key, (S, 32), dt)
    vcoords = jnp.asarray(
        np.stack([np.random.RandomState(0).randint(0, s, S)
                  for s in out_sh], -1).astype(np.int32))
    scn = SparseConvNet(num_layers=4, out_sh=out_sh, caps=(8192, 8192, 8192),
                        dtype=dt)
    qdhw = world_to_voxel_f(can, jnp.asarray(min_dhw))
    sv = scn.init(key, vol_feats, vcoords, qdhw)
    time_op(lambda v, f, c, q: scn.apply(v, f, c, q), sv, vol_feats, vcoords,
            qdhw, tag="3D bank: SparseConvNet conv+readout")

    # conv stack only (tiny query set isolates the convs)
    q64 = qdhw[:128]
    time_op(lambda v, f, c, q: scn.apply(v, f, c, q), sv, vol_feats, vcoords,
            q64, tag="3D bank: convs only (128 queries)")

    # ---- transformer + decoder at capacity
    tok = jax.random.normal(key, (cap, 3, 32), dt)
    tr = PlaneTransformer(dim=32, dtype=dt)
    tv = tr.init(key, tok)
    time_op(lambda v, t: tr.apply(v, t), tv, tok,
            tag="transformer (cap, 3, 32)")

    from sherf_tpu.nerf.decoders import NeRFDecoder
    dec = NeRFDecoder(dtype=dt)
    pe_pos = positional_encoding(can[None], 6)
    pe_dir = positional_encoding(can[None], 4)
    sf = jax.random.normal(key, (3, 1, cap, 32), dt)
    dv = dec.init(key, pe_pos, sf, pe_dir)
    time_op(lambda v, a, b, c: dec.apply(v, a, b, c), dv, pe_pos, sf, pe_dir,
            tag="NeRF decoder at cap")


if __name__ == "__main__":
    main()
