"""Importance sampling invariants (dead code in shipped configs; kept
API-complete, reference renderer.py:483-542)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sherf_tpu.nerf import sample_pdf, sample_importance


def test_sample_pdf_det_in_range_and_monotonic():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(16, 9).astype(np.float32) * 4, axis=1)
    weights = rng.rand(16, 8).astype(np.float32)
    s = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 32, det=True))
    assert s.shape == (16, 32)
    assert (s >= bins[:, :1] - 1e-5).all() and (s <= bins[:, -1:] + 1e-5).all()
    assert (np.diff(s, axis=1) >= -1e-5).all()


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.asarray(np.linspace(0, 1, 11, dtype=np.float32)[None].repeat(4, 0))
    w = np.full((4, 10), 1e-4, np.float32)
    w[:, 7] = 100.0  # nearly all mass in bin [0.7, 0.8]
    s = np.asarray(sample_pdf(bins, jnp.asarray(w), 64, det=True))
    frac = ((s >= 0.7) & (s <= 0.8)).mean()
    assert frac > 0.9


def test_sample_pdf_random_mode():
    rng = jax.random.PRNGKey(0)
    bins = jnp.asarray(np.linspace(0, 1, 9, dtype=np.float32)[None].repeat(3, 0))
    w = jnp.ones((3, 8))
    s = sample_pdf(bins, w, 16, det=False, rng=rng)
    assert s.shape == (3, 16)
    assert bool(((s >= 0) & (s <= 1)).all())


def test_sample_importance_shapes():
    rng = np.random.RandomState(1)
    z = np.sort(rng.rand(8, 12).astype(np.float32) * 2 + 2, axis=1)
    w = rng.rand(8, 12).astype(np.float32)
    out = np.asarray(sample_importance(jnp.asarray(z), jnp.asarray(w), 24))
    assert out.shape == (8, 24)
    assert (out >= z[:, :1] - 1e-4).all() and (out <= z[:, -1:] + 1e-4).all()


# ---------------------------------------------------------------------------
# renderer-level wiring (round 2: depth_resolution_importance > 0 must run a
# real two-pass hierarchical render, not a silent no-op — VERDICT r1 #5)

from dataclasses import replace

from sherf_tpu.core.config import ModelConfig, RenderConfig
from sherf_tpu.data import make_synthetic_batch
from sherf_tpu.features.sparseconv import prepare_voxel_volume
from sherf_tpu.models import SHERFGenerator
from sherf_tpu.nerf.march import ray_march
from sherf_tpu.smpl import big_pose_params, smpl_forward, synthetic_smpl

_H = _W = 8
_D = 6
_DI = 4


def _setup_importance():
    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts, voxel_size=0.02)
    cfg0 = ModelConfig(
        backbone_resolution=64, voxel_size=0.02,
        render=RenderConfig(depth_resolution=_D, point_capacity_frac=1.0))
    cfg1 = replace(cfg0, render=replace(cfg0.render,
                                        depth_resolution_importance=_DI))
    model0 = SHERFGenerator(cfg0, out_sh=out_sh)
    model1 = SHERFGenerator(cfg1, out_sh=out_sh)
    batch = make_synthetic_batch(smpl, batch_size=1, H=_H, W=_W, seed=0)
    variables = jax.jit(
        lambda b: model0.init(jax.random.PRNGKey(0), b, smpl))(batch)
    return smpl, model0, model1, batch, variables


@pytest.mark.heavy
def test_importance_knob_is_not_silent():
    """Di>0 must run the hierarchical path: valid image that DIFFERS from
    the coarse-only render with identical params (r1 weak item: the knob
    was silently ignored)."""
    smpl, model0, model1, batch, variables = _setup_importance()
    out0 = jax.jit(lambda v, b: model0.apply(v, b, smpl))(variables, batch)
    out1 = jax.jit(lambda v, b: model1.apply(v, b, smpl))(variables, batch)
    img0 = np.asarray(out0["image_raw"])
    img1 = np.asarray(out1["image_raw"])
    assert img1.shape == img0.shape
    assert np.isfinite(img1).all()
    assert np.abs(img1).max() <= 1.001
    assert np.abs(img1 - img0).max() > 1e-6, \
        "importance pass produced the coarse-only image"
    # weights stay a valid opacity
    acc = np.asarray(out1["weights_image"])
    assert acc.min() >= -1e-5 and acc.max() <= 1.0 + 1e-5


@pytest.mark.heavy
def test_importance_recomposition_matches_renderer():
    """Pin the two-pass wiring: capture both _eval_points_full calls and
    recompose coarse march -> sample_importance -> unify(sort) -> march in
    the test; must reproduce the renderer's image exactly (reference fine
    pass semantics, renderer.py:374-393 + 443-456)."""
    smpl, _, model1, batch, variables = _setup_importance()
    out, mvars = model1.apply(
        variables, batch, smpl,
        capture_intermediates=lambda mdl, name: name == "_eval_points_full",
        mutable=["intermediates"])
    calls = mvars["intermediates"]["renderer"]["_eval_points_full"]
    assert len(calls) == 2, "expected one coarse + one fine decode"
    (col_c, den_c), (col_f, den_f) = calls

    B, N = batch.ray_o.shape[:2]
    steps = jnp.linspace(0.0, 1.0, _D)
    depths = batch.near[..., None] + (batch.far - batch.near)[..., None] * steps

    col_c = col_c.reshape(B, N, _D, 3)
    den_c = den_c.reshape(B, N, _D)
    col_f = col_f.reshape(B, N, _DI, 3)
    den_f = den_f.reshape(B, N, _DI)

    _, _, w = jax.vmap(lambda c, s, t, rd: ray_march(c, s, t, rd))(
        col_c, den_c, depths, batch.ray_d)
    z_fine = sample_importance(depths.reshape(B * N, _D),
                               w.reshape(B * N, _D), _DI,
                               det=True).reshape(B, N, _DI)

    all_d = jnp.concatenate([depths, z_fine], axis=-1)
    order = jnp.argsort(all_d, axis=-1)
    all_d = jnp.take_along_axis(all_d, order, axis=-1)
    all_c = jnp.take_along_axis(jnp.concatenate([col_c, col_f], axis=2),
                                order[..., None], axis=2)
    all_s = jnp.take_along_axis(jnp.concatenate([den_c, den_f], axis=2),
                                order, axis=2)
    rgb, _, _ = jax.vmap(lambda c, s, t, rd: ray_march(c, s, t, rd))(
        all_c, all_s, all_d, batch.ray_d)

    np.testing.assert_allclose(
        np.asarray(out["image_raw"]).reshape(B, N, 3), np.asarray(rgb),
        rtol=1e-5, atol=1e-5)


@pytest.mark.heavy
def test_budgeted_importance_matches_dense():
    """The budgeted hierarchical path (prune -> compact -> decode on both
    passes, r3: _forward_importance_budgeted) must reproduce the dense
    full-compute importance render when the caps are generous."""
    smpl, _, model1, batch, variables = _setup_importance()
    cfgd = model1.cfg
    cfgb = replace(cfgd, render=replace(cfgd.render,
                                        point_capacity_frac=0.5))
    _, out_sh = prepare_voxel_volume(
        np.asarray(batch.t_vertices[0]), voxel_size=cfgd.voxel_size)
    modelb = SHERFGenerator(cfgb, out_sh=out_sh)

    dense = jax.jit(lambda v, b: model1.apply(v, b, smpl))(variables, batch)
    (budg, mvars) = jax.jit(lambda v, b: modelb.apply(
        v, b, smpl, mutable=["diag"]))(variables, batch)

    from sherf_tpu.core.diag import overflow_report
    overflow = overflow_report(jax.device_get(mvars.get("diag", {})))
    assert all(v == 0 for v in overflow.values()), overflow
    assert {"imp_coarse_overflow", "imp_fine_overflow"} <= set(overflow), \
        overflow  # the budgeted path actually ran and sowed its counters

    np.testing.assert_allclose(np.asarray(budg["image_raw"]),
                               np.asarray(dense["image_raw"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(budg["weights_image"]),
                               np.asarray(dense["weights_image"]),
                               rtol=1e-4, atol=1e-4)
