"""SSIM parity, loss stack, and a two-step training smoke test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
from sherf_tpu.data import make_synthetic_batch
from sherf_tpu.features.sparseconv import prepare_voxel_volume
from sherf_tpu.models import SHERFGenerator
from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params
from sherf_tpu.train import (
    ssim, reconstruction_loss, create_train_state, make_train_step,
    step_lr_schedule, ema_update,
)


def test_ssim_matches_pytorch_msssim():
    try:
        from pytorch_msssim import ssim as ref_ssim
        import torch
    except ImportError:
        pytest.skip("pytorch_msssim unavailable")
    rng = np.random.RandomState(0)
    a = rng.rand(2, 32, 32, 3).astype(np.float32)
    b = np.clip(a + rng.randn(2, 32, 32, 3).astype(np.float32) * 0.1, 0, 1)
    ref = ref_ssim(torch.from_numpy(a).permute(0, 3, 1, 2),
                   torch.from_numpy(b).permute(0, 3, 1, 2),
                   data_range=1, size_average=False).numpy()
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_ssim_identical_images_is_one():
    a = jnp.asarray(np.random.RandomState(1).rand(1, 24, 24, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-5)


def test_ssim_masked_subset():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(1, 24, 24, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 24, 24, 3).astype(np.float32))
    mask = jnp.ones((1, 24, 24))
    full = np.asarray(ssim(a, b))
    masked = np.asarray(ssim(a, b, mask=mask))
    np.testing.assert_allclose(masked, full, atol=1e-5)


def test_step_lr_schedule():
    sched = step_lr_schedule(2.5e-3, 20000, 4)
    assert sched(0) == pytest.approx(2.5e-3)
    assert sched(4999) == pytest.approx(2.5e-3)
    assert sched(5000) == pytest.approx(1.25e-3)
    assert sched(10000) == pytest.approx(0.625e-3)


def test_train_step_improves_loss():
    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts, voxel_size=0.02)
    cfg = ModelConfig(backbone_resolution=32, voxel_size=0.02,
                      render=RenderConfig(depth_resolution=4,
                                          point_capacity_frac=0.25,
                                          density_noise=0.0))
    tcfg = TrainConfig(batch_size=2, lr=1e-3)
    model = SHERFGenerator(cfg, out_sh=out_sh)
    batch = make_synthetic_batch(smpl, batch_size=2, H=12, W=12, seed=0)

    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(batch)
    params = variables.pop("params")
    state = create_train_state(params, dict(variables), tcfg)
    step = make_train_step(model, smpl, tcfg, donate=False)

    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 3
    # overfitting a single tiny batch must reduce the loss
    assert losses[-1] < losses[0]


def test_ema_update():
    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    out = ema_update(e, p, beta=0.5)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.5)
