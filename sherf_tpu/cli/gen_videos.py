"""Free-viewpoint orbit videos around a SHERF subject.

The reference's gen_videos.py is vestigial EG3D code whose G.mapping call
lacks the observation image SHERF requires (SURVEY §3.4); this is the
SHERF-aware replacement: fix the observation image, orbit the target camera
around the body, render each frame (BASELINE config #4).
"""

from __future__ import annotations

import argparse
import os


def _orbit_camera(H, W, theta, distance=3.0, height=0.0, focal_scale=0.9):
    import numpy as np

    cam_pos = np.array([distance * np.sin(theta), height,
                        distance * np.cos(theta)], np.float32)
    fwd = -cam_pos / np.linalg.norm(cam_pos)
    up = np.array([0, 1, 0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd]).astype(np.float32)
    T = (-R @ cam_pos).reshape(3, 1).astype(np.float32)
    f = focal_scale * max(H, W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return K, R, T


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="orbit.mp4")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--resume", default=None, help="checkpoint (else random init)")
    p.add_argument("--smpl_model", default=None)
    a = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sherf_tpu.cli.common import build_model, resolve_smpl
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.geometry.rays import get_rays_np, near_far_aabb_np

    smpl = resolve_smpl(a.smpl_model)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=a.depth,
                                          point_capacity_frac=0.25,
                                          density_noise=0.0))
    model, _, cfg = build_model(cfg, smpl)
    base = make_synthetic_batch(smpl, batch_size=1, H=a.size, W=a.size, seed=0)

    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(base)
    if a.resume:
        from sherf_tpu.train.checkpoint import restore_checkpoint
        from sherf_tpu.train.train_state import create_train_state

        params = dict(variables).pop("params")
        extra = {k: v for k, v in variables.items() if k != "params"}
        state = restore_checkpoint(a.resume, create_train_state(params, extra,
                                                                TrainConfig()))
        variables = {"params": state.ema_params, **state.extra_vars}

    fwd = jax.jit(lambda v, b: model.apply(v, b, smpl)["image_raw"])

    verts = np.asarray(base.vertices[0])
    wb = np.stack([verts.min(0) - 0.05, verts.max(0) + 0.05])
    frames = []
    for i in range(a.frames):
        theta = 2 * np.pi * i / a.frames
        K, R, T = _orbit_camera(a.size, a.size, theta)
        ro, rd = get_rays_np(a.size, a.size, K, R, T)
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        near, far, _ = near_far_aabb_np(wb, ro, rd)
        batch = base.replace(ray_o=jnp.asarray(ro)[None],
                             ray_d=jnp.asarray(rd)[None],
                             near=jnp.asarray(near)[None],
                             far=jnp.asarray(far)[None])
        img = np.asarray(fwd(variables, batch)[0]) / 2 + 0.5
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
        print(f"frame {i + 1}/{a.frames}")

    import imageio.v2 as imageio

    ext = os.path.splitext(a.out)[1].lower()
    if ext in (".gif",):
        imageio.mimsave(a.out, frames, fps=10)
    else:
        try:
            imageio.mimsave(a.out, frames, fps=15)
        except Exception:
            alt = os.path.splitext(a.out)[0] + ".gif"
            imageio.mimsave(alt, frames, fps=10)
            print(f"mp4 writer unavailable; wrote {alt}")
            return
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
