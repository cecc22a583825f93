"""End-to-end SHERFGenerator forward on synthetic data (CPU, tiny shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sherf_tpu.core.config import ModelConfig, RenderConfig
from sherf_tpu.data import make_synthetic_batch
from sherf_tpu.features.sparseconv import prepare_voxel_volume
from sherf_tpu.models import SHERFGenerator
from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

H = W = 16
D = 6


# model-level suite: excluded from the smoke tier (pytest.ini)
pytestmark = pytest.mark.heavy

@pytest.fixture(scope="module")
def setup():
    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts, voxel_size=0.02)
    cfg = ModelConfig(
        backbone_resolution=64, voxel_size=0.02,
        render=RenderConfig(depth_resolution=D, point_capacity_frac=1.0),
    )
    model = SHERFGenerator(cfg, out_sh=out_sh)
    batch = make_synthetic_batch(smpl, batch_size=2, H=H, W=W, seed=0)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(batch)
    return smpl, cfg, out_sh, model, batch, variables


def test_forward_shapes_and_finiteness(setup):
    smpl, cfg, out_sh, model, batch, variables = setup
    out = jax.jit(lambda v, b: model.apply(v, b, smpl))(variables, batch)
    assert out["image_raw"].shape == (2, H, W, 3)
    assert out["image_depth"].shape == (2, H, W)
    assert out["weights_image"].shape == (2, H, W)
    for v in out.values():
        assert bool(jnp.isfinite(v).all())
    # rgb in (-1, 1); acc in [0, 1]
    assert float(out["image_raw"].min()) >= -1.001
    assert float(out["image_raw"].max()) <= 1.001
    assert float(out["weights_image"].min()) >= -1e-5
    assert float(out["weights_image"].max()) <= 1.0 + 1e-5


def test_forward_is_deterministic_and_jittable(setup):
    smpl, cfg, out_sh, model, batch, variables = setup
    f = jax.jit(lambda v, b: model.apply(v, b, smpl))
    a = f(variables, batch)
    b = f(variables, batch)
    np.testing.assert_allclose(np.asarray(a["image_raw"]),
                               np.asarray(b["image_raw"]), atol=0)


def test_compaction_matches_full_compute(setup):
    smpl, cfg, out_sh, model, batch, variables = setup
    out_full = jax.jit(lambda v, b: model.apply(v, b, smpl))(variables, batch)

    cfg_c = ModelConfig(
        backbone_resolution=64, voxel_size=0.02,
        render=RenderConfig(depth_resolution=D, point_capacity_frac=0.5),
    )
    model_c = SHERFGenerator(cfg_c, out_sh=out_sh)
    # capacity (50% of all samples) exceeds the in-body point count here,
    # so compacted rendering must agree with full masked compute
    out_c = jax.jit(lambda v, b: model_c.apply(v, b, smpl))(variables, batch)
    np.testing.assert_allclose(np.asarray(out_c["image_raw"]),
                               np.asarray(out_full["image_raw"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_c["weights_image"]),
                               np.asarray(out_full["weights_image"]), atol=1e-4)


def test_ablation_flags_compile(setup):
    smpl, _, out_sh, _, batch, _ = setup
    for flags in [dict(use_3d_feature=False, use_nerf_decoder=False),
                  dict(use_2d_feature=False, use_trans=False)]:
        cfg = ModelConfig(backbone_resolution=64, voxel_size=0.02,
                          render=RenderConfig(depth_resolution=4), **flags)
        model = SHERFGenerator(cfg, out_sh=out_sh)
        variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(batch)
        out = jax.jit(lambda v, b: model.apply(v, b, smpl))(variables, batch)
        assert bool(jnp.isfinite(out["image_raw"]).all()), flags


def test_bf16_compute_path(setup):
    smpl, _, out_sh, _, batch, variables = setup
    cfg16 = ModelConfig(backbone_resolution=64, voxel_size=0.02,
                        compute_dtype="bfloat16",
                        render=RenderConfig(depth_resolution=D,
                                            point_capacity_frac=0.5))
    model16 = SHERFGenerator(cfg16, out_sh=out_sh)
    out16 = jax.jit(lambda v, b: model16.apply(v, b, smpl))(variables, batch)
    assert out16["image_raw"].dtype == jnp.float32
    assert bool(jnp.isfinite(out16["image_raw"]).all())


def test_ray_compaction_matches_uncompacted(setup):
    """ray_capacity_frac < 1 (compact AABB-hitting rays, segmented march,
    pixel scatter-back) must agree with the same point-compacted model at
    full ray count when the budget covers every hitting ray."""
    smpl, cfg, out_sh, model, batch, variables = setup

    def build(ray_frac):
        c = ModelConfig(
            backbone_resolution=64, voxel_size=0.02,
            render=RenderConfig(depth_resolution=D, point_capacity_frac=0.5,
                                ray_capacity_frac=ray_frac))
        return SHERFGenerator(c, out_sh=out_sh)

    out_a = jax.jit(lambda v, b: build(1.0).apply(v, b, smpl))(variables, batch)
    out_b = jax.jit(lambda v, b: build(0.9).apply(v, b, smpl))(variables, batch)
    np.testing.assert_allclose(np.asarray(out_b["image_raw"]),
                               np.asarray(out_a["image_raw"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_b["weights_image"]),
                               np.asarray(out_a["weights_image"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_b["image_depth"]),
                               np.asarray(out_a["image_depth"]), atol=1e-3)


def test_exact_compaction_matches_full_compute(setup):
    """exact_capacity_frac < 1 (second compaction after the exact 5cm test)
    must agree with the dense masked path when the budget covers every
    exact survivor."""
    smpl, cfg, out_sh, model, batch, variables = setup
    out_full = jax.jit(lambda v, b: model.apply(v, b, smpl))(variables, batch)

    cfg_e = ModelConfig(
        backbone_resolution=64, voxel_size=0.02,
        render=RenderConfig(depth_resolution=D, point_capacity_frac=0.5,
                            exact_capacity_frac=0.35),
    )
    model_e = SHERFGenerator(cfg_e, out_sh=out_sh)
    out_e = jax.jit(lambda v, b: model_e.apply(v, b, smpl))(variables, batch)
    np.testing.assert_allclose(np.asarray(out_e["image_raw"]),
                               np.asarray(out_full["image_raw"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_e["weights_image"]),
                               np.asarray(out_full["weights_image"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_e["image_depth"]),
                               np.asarray(out_full["image_depth"]), atol=1e-3)


def test_exact_compaction_with_ray_compaction(setup):
    """All three compaction stages together (rays -> conservative ->
    exact) at ample budgets match the dense path."""
    smpl, cfg, out_sh, model, batch, variables = setup
    out_full = jax.jit(lambda v, b: model.apply(v, b, smpl))(variables, batch)

    cfg_e = ModelConfig(
        backbone_resolution=64, voxel_size=0.02,
        render=RenderConfig(depth_resolution=D, point_capacity_frac=0.5,
                            exact_capacity_frac=0.35, ray_capacity_frac=0.8),
    )
    model_e = SHERFGenerator(cfg_e, out_sh=out_sh)
    out_e = jax.jit(lambda v, b: model_e.apply(v, b, smpl))(variables, batch)
    np.testing.assert_allclose(np.asarray(out_e["image_raw"]),
                               np.asarray(out_full["image_raw"]), atol=1e-4)
