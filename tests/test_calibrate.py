"""Scene-adaptive budget calibration (sherf_tpu/core/calibrate.py).

The reference sizes pruning stages dynamically (boolean indexing,
renderer equivalent at lib/networks/renderer/if_clight_renderer.py); the
TPU renderer uses static budgets, and calibrate_budgets fits them to a
scene.  These tests check the fitted budgets (a) cover the measured
survivor counts with the requested margin, (b) are rounded for
compile-cache friendliness, and (c) never exceed the dense totals.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from sherf_tpu.core.calibrate import calibrate_budgets, measure_budgets
from sherf_tpu.core.config import ModelConfig, RenderConfig
from sherf_tpu.data import make_synthetic_batch
from sherf_tpu.smpl import synthetic_smpl


H = W = 64
D = 8


@pytest.fixture(scope="module")
def scene():
    smpl = synthetic_smpl(0)
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=0)
    # 8 samples/ray means coarse depth steps; widen the prune margin to
    # match (production uses 48 samples with the default 0.06m margin)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=D,
                                          prune_step_margin=0.3,
                                          density_noise=0.0))
    return batch, cfg


def test_measure_budgets_counts(scene):
    from sherf_tpu.kernels.knn_pallas import ray_body_mask_pallas

    batch, cfg = scene
    m = measure_budgets(batch, cfg)
    aabb = np.asarray(batch.mask_at_box[0]).astype(bool)
    # ray budget = AABB hit AND segment-level body proximity (mirrors the
    # renderer's combined ray compaction mask)
    # same +1mm ray-radius slack as the renderer/measure_budgets (borderline
    # rays must never be dropped while one of their samples survives)
    thr_ray = (np.sqrt(cfg.render.prune_threshold_sq) + 1e-3) ** 2
    seg = np.asarray(ray_body_mask_pallas(
        batch.ray_o[0], batch.ray_d[0], batch.near[0], batch.far[0],
        batch.vertices[0], thr_ray))
    assert m["rays"] == int((aabb & seg).sum())
    assert m["rays"] <= int(aabb.sum())
    M = H * W * D
    assert 0 < m["voxel"] <= M
    assert 0 <= m["exact"] <= M
    # exact survivors are a subset of voxel survivors up to the x8
    # depth-subsample estimator's rounding
    assert m["exact"] <= m["voxel"] + 8 * H * W
    assert m["step_max"] > 0 and m["span"] > 0


def test_calibrate_covers_with_margin(scene):
    batch, cfg = scene
    fitted, worst = calibrate_budgets([batch], cfg, margin=1.25,
                                      round_to=128)
    M = H * W * D
    caps = {
        "rays": int(H * W * fitted.ray_capacity_frac),
        "voxel": int(M * fitted.point_capacity_frac),
        "exact": int(M * fitted.exact_capacity_frac),
    }
    for k in caps:
        assert caps[k] >= worst[k], (k, caps[k], worst[k])
        # margin honoured unless clamped at the dense total
        total = H * W if k == "rays" else M
        if caps[k] < total:
            assert caps[k] >= int(worst[k] * 1.25)
            assert caps[k] % 128 == 0 or caps[k] == total
        assert caps[k] <= total


def test_calibrate_worst_over_batches(scene):
    batch, cfg = scene
    smpl = synthetic_smpl(0)
    other = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=3)
    fitted_two, worst_two = calibrate_budgets([batch, other], cfg,
                                              margin=1.0, round_to=1)
    m1 = measure_budgets(batch, cfg)
    m2 = measure_budgets(other, cfg)
    for k in ("rays", "voxel", "exact"):
        assert worst_two[k] == max(m1[k], m2[k])


def test_calibrate_fits_step_margin_to_scene():
    """calibrate_budgets must REPLACE prune_step_margin with the scene's
    measured max per-ray depth step (snapped up to 5mm): an undersized
    configured margin would silently lose coverage of stride-skipped
    samples, and an oversized one widens the conservative ball the exact
    KNN has to re-test (r4: the static 0.06 default nearly doubled the
    occupancy survivors on the production scene)."""
    smpl = synthetic_smpl(0)
    batch = make_synthetic_batch(smpl, batch_size=1, H=16, W=16, seed=0)
    D = 24
    # configured margin is far too small: the fit must correct it
    # (prune_stride > 1 — at the stride-1 default the margin is unused
    # and the fit is skipped)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=D,
                                          prune_stride=3,
                                          prune_step_margin=1e-3,
                                          density_noise=0.0))
    fitted, worst = calibrate_budgets([batch], cfg)
    step_max = float(jnp.max((batch.far - batch.near) / (D - 1)))
    assert fitted.prune_step_margin >= step_max
    assert fitted.prune_step_margin <= step_max + 0.005 + 1e-9
    assert abs(fitted.prune_step_margin / 0.005
               - round(fitted.prune_step_margin / 0.005)) < 1e-9


def test_calibrate_coarse_grid_uses_stride_one():
    """Below D=24 the renderer (and measure_budgets, which must mirror it)
    falls back to testing every sample: the stride's dilation margin
    cannot cover multi-decimeter depth steps, and the old behavior
    silently dropped exact-surviving samples (r3 find: budgeted renders
    diverged from parity mode by ~4e-2 at coarse depth grids)."""
    smpl = synthetic_smpl(0)
    batch = make_synthetic_batch(smpl, batch_size=1, H=16, W=16, seed=0)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=4,
                                          density_noise=0.0))
    fitted, worst = calibrate_budgets([batch], cfg)  # must not raise
    assert worst["voxel"] > 0


def test_sparse_site_counts_match_live_downsample():
    """measure_sparse_sites (host NumPy) must count exactly the site sets
    the live downsample_sites cascade produces — and the shipped default
    sparse_caps must cover a typical body (an undersized cap silently
    truncates volume features; this regressed once at caps=(8192,)*3)."""
    import jax

    from sherf_tpu.core.calibrate import (calibrate_sparse_caps,
                                          measure_sparse_sites)
    from sherf_tpu.features.sparseconv import (
        build_index_grid, downsample_sites, prepare_voxel_volume,
        voxelize_coords)
    from sherf_tpu.smpl import big_pose_params, smpl_forward

    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    voxel = 0.02  # coarse grid keeps the dense index grids test-sized
    counts = measure_sparse_sites(t_verts, voxel)
    assert counts[0] > counts[1] > counts[2] > 0

    min_dhw, out_sh = prepare_voxel_volume(t_verts, voxel_size=voxel)
    coords = voxelize_coords(jnp.asarray(t_verts), min_dhw, voxel)
    valid = jnp.ones(coords.shape[0], bool)
    shape = out_sh
    for i in range(3):
        cap = counts[i] + 64  # roomy: survivor count must be exact
        nc, nv, shape, _ = downsample_sites(coords, valid, shape, cap)
        assert int(jax.device_get(nv.sum())) == counts[i], f"scale {i}"
        coords, valid = nc, nv

    caps = calibrate_sparse_caps([t_verts], voxel, margin=1.1, round_to=256)
    assert all(c >= n for c, n in zip(caps, counts))
    assert all(c % 256 == 0 for c in caps)

    # the production default must cover the production-voxel body
    prod = measure_sparse_sites(t_verts, 0.005)
    default = ModelConfig().resolved_sparse_caps
    assert all(c >= n for c, n in zip(default, prod)), (default, prod)
