"""Micro-benchmarks for the gather-bound stages of the 512x512x48 frame.

Isolates each feature-bank lookup and the prune/compaction stages so sampler
variants can be compared directly on the TPU (the end-to-end frame mixes
them, hiding which variant wins).  Run: python tools/profile_gathers.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2, tag=""):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:44s}: {ms:8.2f} ms")
    return ms


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sherf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp  # noqa: E402


def main(N=524288, M=512 * 512 * 48):
    from sherf_tpu.core.config import ModelConfig
    from sherf_tpu.features.sparseconv import (
        prepare_voxel_volume, trilinear_dense_sample,
        trilinear_dense_sample_packed)
    from sherf_tpu.kernels.capsules import prune_mask
    from sherf_tpu.kernels.compaction import compact_mask
    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d, grid_sample_2d_packed, pack_corners_2d)
    from sherf_tpu.kernels.knn import nn_1, nn_1_tables
    from sherf_tpu.kernels.knn_pallas import nn_1_pallas
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    key = jax.random.PRNGKey(0)
    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = smpl_forward(smpl, jnp.asarray(bp["poses"]),
                           jnp.asarray(bp["shapes"]))[0]
    min_dhw, out_sh = prepare_voxel_volume(np.asarray(t_verts))
    from sherf_tpu.features.sparseconv import voxelize_coords
    coords = np.asarray(voxelize_coords(jnp.asarray(t_verts), min_dhw))
    print(f"N={N} queries, out_sh={out_sh}", file=sys.stderr)

    dt = jnp.bfloat16

    # ---- 2D bank: grid_sample variants
    feat256 = jax.random.normal(key, (256, 256, 64), dt)
    img512 = jax.random.normal(key, (512, 512, 3), dt)
    uv = jax.random.uniform(key, (N, 2), minval=-1, maxval=1)

    timeit(jax.jit(lambda im, c: grid_sample_2d(im, c, align_corners=True)),
           feat256, uv, tag="2d feat 256x256x64, 4-gather")
    timeit(jax.jit(lambda im, c: grid_sample_2d(im, c, align_corners=True)),
           img512, uv, tag="2d img 512x512x3, 4-gather")
    timeit(jax.jit(lambda im, c: grid_sample_2d_packed(
        pack_corners_2d(im), c, align_corners=True)),
           feat256, uv, tag="2d feat packed (incl pack)")
    packed256 = jax.jit(pack_corners_2d)(feat256)
    timeit(jax.jit(lambda p, c: grid_sample_2d_packed(
        p, c, align_corners=True)), packed256, uv,
        tag="2d feat packed (pre-packed)")

    # ---- 1D bank: triplane 3x 4-gather at 256^2 x 32
    planes = jax.random.normal(key, (3, 256, 256, 32), dt)
    p3 = jax.random.uniform(key, (N, 3), minval=-1, maxval=1)

    def triplane(pl, pts):
        return jnp.stack([
            grid_sample_2d(pl[0], pts[:, (0, 1)]),
            grid_sample_2d(pl[1], pts[:, (0, 2)]),
            grid_sample_2d(pl[2], pts[:, (2, 1)]),
        ])
    timeit(jax.jit(triplane), planes, p3, tag="1d triplane 3x 4-gather")

    # ---- 3D bank: trilinear readout variants (one scale at a time)
    S = coords.shape[0]
    cap = 8192
    pad = cap - S % cap if S % cap else 0
    coords_p = jnp.asarray(np.pad(coords, ((0, pad), (0, 0))), jnp.int32)
    valid = jnp.arange(coords_p.shape[0]) < S
    pos = jax.random.uniform(key, (N, 3), minval=0.0,
                             maxval=float(min(out_sh) - 2))
    for C, scale in ((32, 1), (64, 2), (96, 4)):
        shape = tuple(int(s) // scale for s in out_sh)
        feats = jax.random.normal(key, (coords_p.shape[0], C), dt)
        cs = coords_p // scale
        timeit(jax.jit(lambda f, c, p: trilinear_dense_sample(
            f, c, valid, shape, p)), feats, cs, pos / scale,
            tag=f"3d dense 8-gather C={C} shape={shape}")
        timeit(jax.jit(lambda f, c, p: trilinear_dense_sample_packed(
            f, c, valid, shape, p)), feats, cs, pos / scale,
            tag=f"3d packed 1-gather C={C}")

    # ---- KNN variants at N
    q = jax.random.uniform(key, (N, 3), minval=-1.2, maxval=1.2)
    v = jnp.asarray(t_verts)
    timeit(jax.jit(lambda a, b: nn_1_pallas(a, b)[0]), q, v,
           tag=f"knn pallas {N // 1000}k x 6890")
    timeit(jax.jit(lambda a, b: nn_1(a, b)[0]), q, v,
           tag=f"knn jnp {N // 1000}k x 6890")

    # ---- prune + compaction over the full 12.6M candidates
    pts_full = jax.random.uniform(key, (M, 3), minval=-1.2, maxval=1.2)
    joints = smpl_forward(smpl, jnp.asarray(bp["poses"]),
                          jnp.asarray(bp["shapes"]))[1]
    timeit(jax.jit(lambda p: prune_mask(p, v, joints, smpl, 0.05)), pts_full,
           tag="capsule prune 12.6M pts")
    mask = jax.jit(lambda p: prune_mask(p, v, joints, smpl, 0.05))(pts_full)
    timeit(jax.jit(lambda m: compact_mask(m, N)[0]), mask,
           tag=f"pallas compaction 12.6M -> {N // 1000}k")

    # ---- gather cost law: row gathers vs row width
    for C in (4, 16, 64, 256, 1024):
        tbl = jax.random.normal(key, (65536, C), dt)
        idx = jax.random.randint(key, (N,), 0, 65536)
        timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tbl, idx,
               tag=f"raw row gather 524k x C={C} bf16")


if __name__ == "__main__":
    main()
