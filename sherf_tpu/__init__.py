"""sherf_tpu — a TPU-native generalizable human NeRF framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SHERF
(skhu101/SHERF, ICCV 2023): recover an animatable human NeRF in a canonical
big-pose SMPL space from a single observation image, then render novel views
and novel poses.

Layer map (mirrors the reference's capability surface, re-designed TPU-first):

  cli/        train / eval / gen_videos / gen_samples entry points
  train/      loss stack, train step (pjit over a device mesh), EMA, ckpt
  eval/       novel-view / novel-pose protocols, PSNR/SSIM/LPIPS
  models/     SHERFGenerator — the flagship single-image human NeRF
  nerf/       volumetric renderer: stratified sampling, SMPL LBS warps,
              hierarchical feature fusion, NeRF decoder, ray marching
  features/   ResNet18 encoders, StyleGAN2 triplane backbone, sparse voxel
              conv (spconv equivalent), positional encodings, transformer
  kernels/    TPU compute primitives: upfirdn2d/bias_act (XLA), KNN
              (Pallas), bilinear/trilinear gather sampling, ray marcher
  smpl/       SMPL body model: shape/pose blendshapes, FK, LBS (pure jnp)
  geometry/   rays, AABB near/far, projection, rodrigues, normals
  data/       host-side dataset pipelines (RenderPeople/THuman/HuMMan/ZJU)
  parallel/   mesh construction + sharding rules (DP x ray-sharding)
  compat/     reference-checkpoint import (torch pickle -> param pytree)
  core/       config dataclasses and pytree types
"""

__version__ = "0.1.0"
