"""Render one synthetic frame end-to-end and write a PNG — the quickest way
to see the whole stack (encoders -> triplane -> warps -> renderer) run."""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="demo.png")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--smpl_model", default=None)
    a = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sherf_tpu.cli.common import build_model, resolve_smpl
    from sherf_tpu.core.config import ModelConfig, RenderConfig
    from sherf_tpu.data import make_synthetic_batch

    smpl = resolve_smpl(a.smpl_model)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=a.depth,
                                          point_capacity_frac=0.25,
                                          density_noise=0.0))
    model, out_sh, cfg = build_model(cfg, smpl)
    batch = make_synthetic_batch(smpl, batch_size=1, H=a.size, W=a.size, seed=0)

    t0 = time.perf_counter()
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(batch)
    out = jax.jit(lambda v, b: model.apply(v, b, smpl))(variables, batch)
    img = np.asarray(out["image_raw"][0]) / 2.0 + 0.5
    depth = np.asarray(out["image_depth"][0])
    acc = np.asarray(out["weights_image"][0])
    print(f"rendered {a.size}x{a.size} in {time.perf_counter() - t0:.1f}s "
          f"(incl. compile); acc range [{acc.min():.3f}, {acc.max():.3f}]")

    import imageio.v2 as imageio

    dn = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-6)
    panel = np.concatenate([
        np.clip(img, 0, 1),
        np.repeat(dn[..., None], 3, -1),
        np.repeat(np.clip(acc, 0, 1)[..., None], 3, -1),
    ], axis=1)
    imageio.imwrite(a.out, (panel * 255).astype(np.uint8))
    print(f"wrote {a.out} (rgb | depth | acc)")


if __name__ == "__main__":
    main()
