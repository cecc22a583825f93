"""Adversarial training phases (API completeness).

The shipped SHERF configs zero the GAN objective (loss.py:162-165 keeps
0 * loss_Gmain_Dgen and the D phases are fed but unused), yet the framework
surface includes the D tower, the non-saturating softplus losses and lazy R1
regularization (loss.py:292-346, training_loop.py:243-256).  This module
provides them natively; enable by setting TrainConfig-like weights > 0 in
``make_gan_train_step``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sherf_tpu.features.discriminator import DualDiscriminator


def g_adversarial_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating G loss: softplus(-D(fake)) (loss.py:162)."""
    return jnp.mean(jax.nn.softplus(-fake_logits))


def d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """softplus(D(fake)) + softplus(-D(real)) (loss.py:300,320)."""
    return jnp.mean(jax.nn.softplus(fake_logits)) + \
        jnp.mean(jax.nn.softplus(-real_logits))


def r1_penalty(d_apply: Callable, d_params, image: jnp.ndarray,
               image_raw: jnp.ndarray) -> jnp.ndarray:
    """R1 gradient penalty on real images (loss.py:323-338)."""
    def logit_sum(img):
        return jnp.sum(d_apply(d_params, img, image_raw))

    grads = jax.grad(logit_sum)(image)
    return jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))


def make_gan_losses(d_model: DualDiscriminator):
    """Returns (g_term_fn, d_term_fn) over generator outputs / real images.

    g_term_fn(d_params, gen_out) -> scalar adversarial G term
    d_term_fn(d_params, gen_out, real_image, real_raw, r1_gamma, do_r1)
        -> (scalar, metrics)
    """
    def d_apply(params, image, image_raw):
        return d_model.apply({"params": params}, image, image_raw)

    def g_term(d_params, gen_out):
        logits = d_apply(d_params, gen_out["image"], gen_out["image_raw"])
        return g_adversarial_loss(logits)

    def d_term(d_params, gen_out, real_image, real_raw,
               r1_gamma: float = 10.0, do_r1: bool = False):
        fake = d_apply(d_params, jax.lax.stop_gradient(gen_out["image"]),
                       jax.lax.stop_gradient(gen_out["image_raw"]))
        real = d_apply(d_params, real_image, real_raw)
        loss = d_loss(real, fake)
        metrics = {"d_loss": loss,
                   "scores_fake": jnp.mean(fake),
                   "scores_real": jnp.mean(real)}
        if do_r1:
            r1 = r1_penalty(d_apply, d_params, real_image, real_raw)
            loss = loss + r1 * (r1_gamma / 2.0)
            metrics["r1_penalty"] = r1
        return loss, metrics

    return g_term, d_term


def create_d_state(d_model: DualDiscriminator, example_image, example_raw,
                   lr: float = 2e-3, betas: Tuple[float, float] = (0.0, 0.99),
                   rng: Optional[jax.Array] = None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = d_model.init(rng, example_image, example_raw)["params"]
    tx = optax.chain(optax.zero_nans(),
                     optax.scale_by_adam(b1=betas[0], b2=betas[1]),
                     optax.scale(-lr))
    return params, tx, tx.init(params)
