"""Shared CLI plumbing: SMPL asset resolution and model/config construction
from flags (the counterpart of reference train.py:211-360 config assembly)."""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np

from sherf_tpu.core.config import ModelConfig, RenderConfig


def resolve_smpl(path: Optional[str]):
    """Load the SMPL pickle if given/else the standard asset location, else
    fall back to the synthetic test model (datasets then won't align, but
    every code path runs)."""
    from sherf_tpu.smpl import load_smpl, synthetic_smpl

    candidates = [path] if path else []
    candidates += ["assets/SMPL_NEUTRAL.pkl",
                   os.path.expanduser("~/assets/SMPL_NEUTRAL.pkl")]
    for c in candidates:
        if c and os.path.exists(c):
            return load_smpl(c)
    print("WARNING: SMPL asset not found; using the synthetic body model")
    return synthetic_smpl(0)


def add_model_flags(p: argparse.ArgumentParser):
    b = lambda s: s.lower() in ("1", "true", "yes")
    p.add_argument("--use_1d_feature", type=b, default=True)
    p.add_argument("--use_2d_feature", type=b, default=True)
    p.add_argument("--use_3d_feature", type=b, default=True)
    p.add_argument("--use_trans", type=b, default=True)
    p.add_argument("--use_nerf_decoder", type=b, default=True)
    p.add_argument("--use_sr_module", type=b, default=False)
    p.add_argument("--white_back", type=b, default=False)
    p.add_argument("--neural_rendering_resolution_initial", type=int, default=512)
    p.add_argument("--depth_resolution", type=int, default=48)
    p.add_argument("--point_capacity_frac", type=float, default=1.0 / 8.0)
    p.add_argument("--calibrate_budgets", type=b, default=False,
                   help="fit the static prune budgets to measured survivor "
                        "counts of the first batch(es) (core/calibrate.py)")
    p.add_argument("--calibrate_margin", type=float, default=1.3)
    p.add_argument("--smpl_model", type=str, default=None)


def model_config_from_args(a) -> ModelConfig:
    return ModelConfig(
        use_1d_feature=a.use_1d_feature,
        use_2d_feature=a.use_2d_feature,
        use_3d_feature=a.use_3d_feature,
        use_trans=a.use_trans,
        use_nerf_decoder=a.use_nerf_decoder,
        use_sr_module=a.use_sr_module,
        img_resolution=a.neural_rendering_resolution_initial,
        render=RenderConfig(
            depth_resolution=a.depth_resolution,
            point_capacity_frac=a.point_capacity_frac,
            white_back=a.white_back,
        ),
    )


def calibrated_config(cfg: ModelConfig, batches, margin: float = 1.3
                      ) -> ModelConfig:
    """Replace cfg's render budgets with scene-fitted ones (the TPU-native
    counterpart of the reference's dynamic boolean-indexed pruning, which
    sizes survivor tensors per frame).  Calibrate on representative
    worst-case batches; params are budget-independent, so a model rebuilt
    with the fitted config accepts existing checkpoints unchanged."""
    import dataclasses

    from sherf_tpu.core.calibrate import calibrate_budgets

    fitted, worst = calibrate_budgets(batches, cfg, margin=margin)
    print(f"calibrated budgets: rays {worst['rays']} -> "
          f"frac {fitted.ray_capacity_frac:.4f}, "
          f"voxel {worst['voxel']} -> {fitted.point_capacity_frac:.4f}, "
          f"exact ~{worst['exact']} -> {fitted.exact_capacity_frac:.4f}")
    return dataclasses.replace(cfg, render=fitted)


def build_model(cfg: ModelConfig, smpl) -> Tuple[object, tuple]:
    import dataclasses

    import jax.numpy as jnp

    from sherf_tpu.core.calibrate import calibrate_sparse_caps
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl.lbs import big_pose_params, smpl_forward

    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts, voxel_size=cfg.voxel_size)
    # fit the sparse-conv site capacities to this body's exact per-scale
    # site counts (undersized caps silently truncate volume features)
    caps = calibrate_sparse_caps([t_verts], cfg.voxel_size)
    cfg = dataclasses.replace(cfg, sparse_caps=caps)
    return SHERFGenerator(cfg, out_sh=out_sh), out_sh
