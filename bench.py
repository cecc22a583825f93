"""Benchmark: 512x512 single-image human NeRF rendering on one chip.

Prints ONE JSON line: frames/sec for the flagship SHERF forward at the
production configuration (512x512 rays, 48 stratified samples/ray, full
hierarchical feature bank + transformer fusion + NeRF decoder — the shipped
eval config of the reference, train.py:349-350 + eval_*.sh flags).

vs_baseline is measured against the A100 PyTorch reference estimate recorded
in BASELINE.md (no published numbers exist in the reference repo; see the
"Measured baselines" section there for how the denominator was set).
"""

import json
import sys
import time

import numpy as np

REFERENCE_FPS_BASELINE = 0.5  # A100 torch reference estimate (BASELINE.md)


def main(H=512, W=512, depth=48, iters=10, capacity_frac=1.0 / 16.0,
         ray_frac=0.375, exact_frac=1.0 / 48.0):
    import jax
    import jax.numpy as jnp

    from sherf_tpu.core.config import ModelConfig, RenderConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.kernels.knn import nn_1
    from sherf_tpu.kernels.occupancy import occupancy_mask
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    print(f"devices: {jax.devices()}", file=sys.stderr)

    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts)
    # ray budget: the synthetic scene's mask_at_box covers ~30% of rays;
    # 37.5% static budget keeps every hitting ray (exact) with headroom
    cfg = ModelConfig(compute_dtype="bfloat16", render=RenderConfig(
        depth_resolution=depth, point_capacity_frac=capacity_frac,
        ray_capacity_frac=ray_frac, exact_capacity_frac=exact_frac,
        density_noise=0.0))
    model = SHERFGenerator(cfg, out_sh=out_sh)
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=0)

    # ---- budget validation: the static capacities must cover the scene's
    # true survivor counts or the render silently truncates body samples
    M = H * W * depth
    steps = jnp.linspace(0.0, 1.0, depth)
    dvals = batch.near[0][:, None] + (batch.far[0]
                                      - batch.near[0])[:, None] * steps
    pts = (batch.ray_o[0][:, None]
           + dvals[..., None] * batch.ray_d[0][:, None]).reshape(-1, 3)
    from sherf_tpu.kernels.occupancy import CELL, GRID_SIZE, strided_occupancy
    span = float(jnp.max(jnp.max(batch.vertices[0], 0)
                         - jnp.min(batch.vertices[0], 0)))
    assert span + 0.5 < GRID_SIZE * CELL, \
        f"body span {span:.2f}m too large for the occupancy grid"
    rcfg = cfg.render
    step_max = float(jnp.max((batch.far[0] - batch.near[0]) / (depth - 1)))
    assert step_max <= rcfg.prune_step_margin, \
        f"depth step {step_max:.3f}m exceeds prune_step_margin"
    occ_n = int(jax.jit(lambda p, v: strided_occupancy(
        p.reshape(-1, depth, 3), v, stride=rcfg.prune_stride,
        step_margin=rcfg.prune_step_margin).sum())(pts, batch.vertices[0]))
    assert occ_n <= int(M * capacity_frac), \
        f"voxel survivors {occ_n} overflow point budget {int(M * capacity_frac)}"
    d2 = jax.jit(lambda q, v: nn_1(q, v)[0])(pts[::8], batch.vertices[0])
    exact_n = int((d2 < 0.05 ** 2).sum()) * 8
    assert exact_n <= int(M * exact_frac), \
        f"~{exact_n} exact survivors overflow exact budget {int(M * exact_frac)}"
    hit = int(np.asarray(batch.mask_at_box[0]).astype(bool).sum())
    assert hit <= int(H * W * ray_frac), \
        f"{hit} AABB-hitting rays overflow ray budget {int(H * W * ray_frac)}"
    print(f"budgets: rays {hit}/{int(H * W * ray_frac)}, "
          f"voxel {occ_n}/{int(M * capacity_frac)}, "
          f"exact ~{exact_n}/{int(M * exact_frac)}", file=sys.stderr)

    # init on tiny shapes — the param structure is resolution-independent
    t0 = time.perf_counter()
    small_cfg = ModelConfig(compute_dtype="bfloat16", render=RenderConfig(depth_resolution=4,
                                                density_noise=0.0))
    small = SHERFGenerator(small_cfg, out_sh=out_sh)
    tiny = make_synthetic_batch(smpl, batch_size=1, H=8, W=8, seed=0)
    variables = jax.jit(lambda b: small.init(jax.random.PRNGKey(0), b, smpl))(tiny)
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    fwd = jax.jit(lambda v, b: model.apply(v, b, smpl)["image_raw"])
    t0 = time.perf_counter()
    out = fwd(variables, batch)
    out.block_until_ready()
    print(f"compile+first render: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    assert bool(jnp.isfinite(out).all()), "non-finite render output"

    # warm; NOTE: on the axon platform block_until_ready does not actually
    # block, so every timed iteration forces a host readback (~6 ms,
    # negligible at frame scale)
    np.asarray(fwd(variables, batch).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, batch)
        np.asarray(out.ravel()[0])
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    rays_per_sec = H * W * fps
    print(f"render: {dt * 1e3:.1f} ms/frame  ({rays_per_sec / 1e6:.2f}M rays/s, "
          f"{rays_per_sec * depth / 1e9:.2f}G samples/s)", file=sys.stderr)

    print(json.dumps({
        "metric": f"render_fps_{H}x{W}",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_FPS_BASELINE, 2),
    }))


if __name__ == "__main__":
    main()
