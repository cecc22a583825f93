"""Discriminators + adversarial losses (API-completeness components)."""

import numpy as np
import jax
import jax.numpy as jnp

from sherf_tpu.features.discriminator import (
    Discriminator, DualDiscriminator, minibatch_stddev,
)
from sherf_tpu.train.gan import (
    g_adversarial_loss, d_loss, r1_penalty, make_gan_losses, create_d_state,
)


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
