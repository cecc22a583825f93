"""Stage-level timing of the production 512x512x48 render on one chip.

Times isolated kernels (occupancy prune, compaction, exact KNN, warp,
march) and full-forward ablations (feature banks / transformer off) to
locate the frame's time. Run on the TPU: python tools/profile_stages.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x.ravel()[0]) if hasattr(x, "ravel") else x,
            out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x.ravel()[0]) if hasattr(x, "ravel") else x,
            out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main(H=512, W=512, D=48, frac=1.0 / 24.0):
    import jax
    import jax.numpy as jnp

    from sherf_tpu.core.config import ModelConfig, RenderConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.kernels.knn_pallas import nn_1_pallas
    from sherf_tpu.kernels.occupancy import occupancy_mask
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.nerf.renderer import _compact_indices
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts)
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=0)

    M = H * W * D
    cap = ((max(int(M * frac), 128) + 127) // 128) * 128
    print(f"M={M} cap={cap}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (M, 3), minval=-1.2, maxval=1.2)
    verts = jnp.asarray(t_verts)
    qpts = jax.random.uniform(key, (cap, 3), minval=-1.2, maxval=1.2)

    t = timeit(jax.jit(lambda p, v: occupancy_mask(p, v)), pts, verts)
    print(f"occupancy_mask 12.6M pts     : {t:8.1f} ms")

    occ = jax.jit(lambda p, v: occupancy_mask(p, v))(pts, verts)
    t = timeit(jax.jit(lambda m: _compact_indices(m, cap)[0]), occ)
    print(f"compaction cumsum->{cap//1000}k      : {t:8.1f} ms")

    t = timeit(jax.jit(lambda q, v: nn_1_pallas(q, v)[0]), qpts, verts)
    print(f"exact KNN pallas {cap//1000}k x 6890 : {t:8.1f} ms")

    def run_cfg(tag, **kw):
        cfg = ModelConfig(compute_dtype="bfloat16",
                          render=RenderConfig(depth_resolution=D,
                                              point_capacity_frac=frac,
                                              density_noise=0.0), **kw)
        model = SHERFGenerator(cfg, out_sh=out_sh)
        tiny = make_synthetic_batch(smpl, batch_size=1, H=8, W=8, seed=0)
        scfg = ModelConfig(compute_dtype="bfloat16",
                           render=RenderConfig(depth_resolution=4,
                                               density_noise=0.0), **kw)
        sm = SHERFGenerator(scfg, out_sh=out_sh)
        variables = jax.jit(lambda b: sm.init(jax.random.PRNGKey(0), b,
                                              smpl))(tiny)
        fwd = jax.jit(lambda v, b: model.apply(v, b, smpl)["image_raw"])
        t = timeit(fwd, variables, batch, iters=5)
        print(f"fwd {tag:26s}: {t:8.1f} ms")
        return t

    full = run_cfg("full (production)")
    run_cfg("no transformer", use_trans=False)
    run_cfg("no 3d bank", use_3d_feature=False)
    run_cfg("no 2d bank", use_2d_feature=False)
    run_cfg("no 1d bank (planes off)", use_1d_feature=False)
    run_cfg("1d only", use_2d_feature=False, use_3d_feature=False,
            use_trans=False)
    print(f"full frame: {full:.1f} ms -> {1000.0 / full:.2f} fps")


if __name__ == "__main__":
    main()
