"""Render still samples and (optionally) extract the canonical shape
(SHERF-aware replacement of the reference's vestigial gen_samples.py, whose
EG3D G.mapping call lacks the observation image — SURVEY §3.4; --shapes
samples the canonical density field on a grid and extracts the iso-surface
mesh, matching gen_samples.py:239-272 + shape_utils.py of the reference)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outdir", default="samples")
    p.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--shapes", action="store_true",
                   help="also export the canonical density field")
    p.add_argument("--shape_res", type=int, default=64)
    p.add_argument("--shape_level", type=float, default=10.0,
                   help="density iso-level for the extracted mesh")
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
    model, _, cfg = build_model(cfg, smpl)

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
            from sherf_tpu.geometry.shape import (
                convert_sdf_samples_to_ply, write_mrc)

            sigma = sample_density_grid(model, variables, batch, smpl,
                                        a.shape_res)
            lo = np.asarray(batch.t_bounds[0, 0])
            hi = np.asarray(batch.t_bounds[0, 1])
            voxel = float((hi - lo).max()) / (a.shape_res - 1)
            write_mrc(os.path.join(a.outdir, f"seed{seed:04d}.mrc"), sigma,
                      voxel_size=voxel)
            convert_sdf_samples_to_ply(
                sigma, lo, voxel,
                os.path.join(a.outdir, f"seed{seed:04d}.ply"),
                level=a.shape_level)
            print("wrote canonical density .mrc + iso-surface .ply")


def sample_density_grid(model, variables, batch, smpl, res: int,
                        chunk: int = 65536):
    """Evaluate the canonical density field on a res^3 grid (in the
    canonical t_bounds AABB).  Returns (res, res, res) float32 sigma."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    lo = np.asarray(batch.t_bounds[0, 0])
    hi = np.asarray(batch.t_bounds[0, 1])
    axes = [np.linspace(lo[i], hi[i], res, dtype=np.float32) for i in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    pad = (-len(grid)) % chunk
    grid_p = np.pad(grid, ((0, pad), (0, 0)))

    query = jax.jit(lambda v, b, p: model.apply(
        v, b, smpl, p, method=model.query_canonical)["sigma"])
    out = [np.asarray(query(variables, batch, jnp.asarray(c[None]))[0, :, 0],
                      np.float32)
           for c in grid_p.reshape(-1, chunk, 3)]
    return np.concatenate(out)[:len(grid)].reshape(res, res, res)


if __name__ == "__main__":
    main()
