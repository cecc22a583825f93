"""Discriminators + adversarial losses (API-completeness components)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sherf_tpu.features.discriminator import (
    Discriminator, DualDiscriminator, minibatch_stddev,
)
from sherf_tpu.train.gan import (
    g_adversarial_loss, d_loss, r1_penalty, make_gan_losses, create_d_state,
)


# model-level suite: excluded from the smoke tier (pytest.ini)
pytestmark = pytest.mark.heavy

def test_discriminator_shapes():
    d = Discriminator(img_resolution=64, img_channels=3, channel_max=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(params, x)
    assert out.shape == (2, 1)
    assert bool(jnp.isfinite(out).all())


def test_dual_discriminator_concats_raw():
    d = DualDiscriminator(img_resolution=64, channel_max=64)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    raw = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(2), img, raw)
    out = d.apply(params, img, raw)
    assert out.shape == (1, 1)


def test_minibatch_stddev_appends_channel():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 6))
    y = minibatch_stddev(x, group_size=4)
    assert y.shape == (4, 8, 8, 7)
    # stddev channel is constant per group
    np.testing.assert_allclose(np.asarray(y[..., -1]).std(), 0.0, atol=1e-6)


def test_gan_losses_and_r1():
    d = DualDiscriminator(img_resolution=32, channel_max=32)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    raw = img[:, ::2, ::2]
    params, tx, opt = create_d_state(d, img, raw, rng=jax.random.PRNGKey(1))

    g_term, d_term = make_gan_losses(d)
    gen_out = {"image": img + 0.1, "image_raw": raw}
    g = g_term(params, gen_out)
    assert np.isfinite(float(g))
    loss, metrics = d_term(params, gen_out, img, raw, do_r1=True)
    assert np.isfinite(float(loss))
    assert float(metrics["r1_penalty"]) >= 0

    # one optimizer step reduces d_loss on fixed inputs
    def f(p):
        return d_term(p, gen_out, img, raw)[0]

    for _ in range(5):
        grads = jax.grad(f)(params)
        updates, opt = tx.update(grads, opt, params)
        import optax
        params = optax.apply_updates(params, updates)
    assert float(f(params)) < float(loss)


def test_gan_train_step_phases():
    """Full adversarial phase wiring (round 2, VERDICT r1 #5): Gmain with
    adv term + Dmain + lazy Dreg all execute, losses finite, both towers'
    params actually move."""
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import big_pose_params, smpl_forward, synthetic_smpl
    from sherf_tpu.train import create_train_state
    from sherf_tpu.train.gan import create_d_train_state, make_gan_train_step

    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts, voxel_size=0.02)
    cfg = ModelConfig(backbone_resolution=32, voxel_size=0.02,
                      render=RenderConfig(depth_resolution=4,
                                          point_capacity_frac=0.25,
                                          density_noise=0.0))
    tcfg = TrainConfig(batch_size=2, lr=1e-3, adv_weight=0.1,
                       d_reg_interval=2)
    model = SHERFGenerator(cfg, out_sh=out_sh)
    batch = make_synthetic_batch(smpl, batch_size=2, H=16, W=16, seed=0)

    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(batch)
    params = dict(variables).pop("params")
    extra = {k: v for k, v in variables.items() if k != "params"}
    g_state = create_train_state(params, extra, tcfg)

    d_model = DualDiscriminator(img_resolution=16, channel_max=32)
    real = batch.img * 2.0 - 1.0
    d_state = create_d_train_state(d_model, real, real, tcfg,
                                   rng=jax.random.PRNGKey(1))
    d0 = jax.tree.map(np.asarray, d_state.params)

    g_step, d_main, d_reg = make_gan_train_step(model, smpl, d_model, tcfg)
    rng = jax.random.PRNGKey(3)
    g_state, g_metrics = g_step(g_state, d_state, batch, rng)
    assert np.isfinite(float(g_metrics["loss"]))
    assert np.isfinite(float(g_metrics["g_adv"]))
    d_state, d_metrics = d_main(d_state, g_state, batch, rng)
    assert np.isfinite(float(d_metrics["d_loss"]))
    assert {"scores_fake", "scores_real"} <= set(d_metrics)
    d_state, r_metrics = d_reg(d_state, batch)
    assert float(r_metrics["r1_penalty"]) >= 0
    assert int(d_state.step) == 2

    moved = any(not np.allclose(np.asarray(a), b)
                for a, b in zip(jax.tree.leaves(d_state.params),
                                jax.tree.leaves(d0)))
    assert moved, "D params did not update"
