"""Decompose the non-feature-bank part of the production frame.

Times, in isolation on the real chip, each base-pipeline stage at the
production scale (512x512x48, ray budget 0.375, point budget M/24):
capsule prune, pallas compaction, fused KNN+tables, LBS warp, segmented
march, StyleGAN2 backbone synthesis, ResNet18 encoders, and the decoder
MLP at capacity.

Run: python tools/profile_base.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


from _timing import time_op


def timeit(fn, *args, tag=""):
    return time_op(fn, *args, tag=tag)


def main(H=512, W=512, D=48, ray_frac=0.375, cap_frac=1.0 / 24.0):
    from sherf_tpu.kernels.capsules import prune_mask
    from sherf_tpu.kernels.compaction import compact_mask
    from sherf_tpu.kernels.knn import nn_1_tables
    from sherf_tpu.kernels.knn_pallas import nn_1_pallas, nn_1_tables_pallas
    from sherf_tpu.nerf.march import ray_march_segmented
    from sherf_tpu.nerf.warp import (
        make_pose_context, target2c_tables, deform_target2c_from_tables)
    from sherf_tpu.core.types import SMPLPose
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    key = jax.random.PRNGKey(0)
    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts, joints = smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                   jnp.asarray(bp["shapes"]))
    verts = jnp.asarray(t_verts)

    Nrays = int(H * W * ray_frac) // 128 * 128
    M = Nrays * D
    cap = int(H * W * D * cap_frac) // 128 * 128
    print(f"rays={Nrays} M={M} cap={cap}", file=sys.stderr)

    pts = jax.random.uniform(key, (M, 3), minval=-1.2, maxval=1.2)
    qpts = jax.random.uniform(key, (cap, 3), minval=-1.2, maxval=1.2)

    timeit(jax.jit(lambda p: prune_mask(p, verts, joints, smpl, 0.05)), pts,
           tag=f"capsule prune {M // 1000}k pts")
    mask = jax.jit(lambda p: prune_mask(p, verts, joints, smpl, 0.05))(pts)
    timeit(jax.jit(lambda m: compact_mask(m, cap)[0]), mask,
           tag=f"pallas compaction {M // 1000}k -> {cap // 1000}k")

    timeit(jax.jit(lambda q, v: nn_1_pallas(q, v)[0]), qpts, verts,
           tag=f"KNN plain {cap // 1000}k")
    ctx = make_pose_context(smpl, SMPLPose(
        poses=jnp.asarray(bp["poses"]), shapes=jnp.asarray(bp["shapes"]),
        R=jnp.eye(3), Th=jnp.zeros(3)))
    tab = target2c_tables(smpl, ctx, ctx)
    timeit(jax.jit(lambda q, v, t: nn_1_tables(q, v, t)[2]), qpts, verts, tab,
           tag=f"KNN+tables dispatch {cap // 1000}k (C={tab.shape[1]})")
    timeit(jax.jit(lambda q, v, t: nn_1_tables_pallas(q, v, t)[2]),
           qpts, verts, tab, tag=f"KNN+tables pallas {cap // 1000}k")

    pay = jax.jit(lambda q, v, t: nn_1_tables(q, v, t)[2])(qpts, verts, tab)
    timeit(jax.jit(lambda p, q: deform_target2c_from_tables(ctx, ctx, p, q, q)),
           pay, qpts, tag=f"LBS warp {cap // 1000}k")

    # segmented march at production sizes
    gidx = jnp.sort(jax.random.randint(key, (cap,), 0, M))
    valid = jnp.ones((cap,), bool)
    colors = jax.random.uniform(key, (cap, 3))
    dens = jax.random.uniform(key, (cap,), minval=-1, maxval=1)
    near = jnp.full((Nrays,), 0.5)
    far = jnp.full((Nrays,), 2.5)
    rays_d = jax.random.normal(key, (Nrays, 3))
    timeit(jax.jit(lambda c, s, g, v: ray_march_segmented(
        c, s, g, v, near, far, rays_d, D)), colors, dens, gidx, valid,
        tag=f"segmented march {cap // 1000}k pts / {Nrays // 1000}k rays")

    # backbone + encoders + decoder
    from sherf_tpu.core.config import ModelConfig
    from sherf_tpu.features.resnet import ResNet18
    from sherf_tpu.features.stylegan2 import StyleGAN2Backbone
    from sherf_tpu.nerf.decoders import NeRFDecoder
    from sherf_tpu.features.encoding import positional_encoding

    cfg = ModelConfig(compute_dtype="bfloat16")
    bb = StyleGAN2Backbone(z_dim=cfg.z_dim, w_dim=cfg.w_dim,
                           img_resolution=cfg.backbone_resolution,
                           img_channels=cfg.n_planes * cfg.plane_channels,
                           mapping_layers=cfg.mapping_layers,
                           channel_base=cfg.channel_base,
                           channel_max=cfg.channel_max, use_bf16=True)
    z = jax.random.normal(key, (1, cfg.z_dim))
    bbv = bb.init(key, z, method=lambda m, z: m.mapping(z))
    ws = jax.jit(lambda v, z: bb.apply(v, z, method=lambda m, z: m.mapping(z)))(bbv, z)
    bbv2 = bb.init(key, ws, method=lambda m, w: m.synthesis(w, noise_mode="none"))
    timeit(jax.jit(lambda v, w: bb.apply(
        v, w, method=lambda m, ww: m.synthesis(ww, noise_mode="none"))),
        bbv2, ws, tag="StyleGAN2 synthesis 256^2x96")

    enc = ResNet18(dtype=jnp.bfloat16)
    img = jax.random.uniform(key, (1, H, W, 3))
    ev = enc.init(key, img)
    timeit(jax.jit(lambda v, im: enc.apply(v, im)), ev, img,
           tag="ResNet18 embed 512^2")
    timeit(jax.jit(lambda v, im: enc.apply(v, im, extract_feature=True)),
           ev, img, tag="ResNet18 feature 512^2")

    dec = NeRFDecoder(dtype=jnp.bfloat16)
    pe_pos = positional_encoding(qpts[None], 6)
    pe_dir = positional_encoding(qpts[None], 4)
    sf = jax.random.normal(key, (3, 1, cap, 32), jnp.bfloat16)
    dv = dec.init(key, pe_pos, sf, pe_dir)
    timeit(jax.jit(lambda v, a, b, c: dec.apply(v, a, b, c)), dv, pe_pos, sf,
           pe_dir, tag=f"NeRF decoder {cap // 1000}k")


if __name__ == "__main__":
    main()
