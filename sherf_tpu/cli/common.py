"""Shared CLI plumbing: SMPL asset resolution and model/config construction
from flags (the counterpart of reference train.py:211-360 config assembly)."""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np

from sherf_tpu.core.config import ModelConfig, RenderConfig


def enable_compile_cache():
    """Persistent XLA compile cache for every CLI entry point (bench.py and
    the tools already do this): on the tunneled axon platform a FRESH
    compile of the production programs costs minutes of wall clock per
    program — the r5 lifecycle artifact's first runs looked wedged but
    were simply recompiling everything a bench run had already cached."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sherf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


enable_compile_cache()


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


def build_model(cfg: ModelConfig, smpl, calibration_bodies=None,
                caps_margin: float = 1.3) -> Tuple[object, tuple, ModelConfig]:
    """Construct the flagship generator.  Returns (model, out_sh, cfg) —
    the returned cfg is the one the model was actually built with (callers
    must use it for logging / serialization / rebuilds).

    Sparse-conv site capacities: auto-calibrated ONLY when cfg.sparse_caps
    is None; an explicitly configured value (e.g. fitted across the served
    subjects) is never overwritten.  ``calibration_bodies``: optional list
    of canonical (big-pose) vertex arrays of the served subjects; defaults
    to the big-pose body of ``smpl`` alone, with ``caps_margin`` headroom
    to absorb subject-shape variation (runtime occupancy is re-checked by
    the renderer's overflow counters)."""
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
    if cfg.sparse_caps is None:
        bodies = (list(calibration_bodies) if calibration_bodies is not None
                  else [t_verts])
        caps = calibrate_sparse_caps(bodies, cfg.voxel_size,
                                     margin=caps_margin)
        cfg = dataclasses.replace(cfg, sparse_caps=caps)
    return SHERFGenerator(cfg, out_sh=out_sh), out_sh, cfg
