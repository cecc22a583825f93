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
from flax import struct

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


# ---------------------------------------------------------------------------
# full adversarial training phases (reference training_loop.py:243-256:
# Gmain + Dmain every step, lazy Dreg (R1) every D_reg_interval steps with
# gain = interval and mb_ratio-adjusted D optimizer hyperparameters)


class DTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: tuple
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def create_d_train_state(d_model: DualDiscriminator, example_image,
                         example_raw, tcfg,
                         rng: Optional[jax.Array] = None) -> DTrainState:
    """Lazy-regularization optimizer: lr and betas scaled by
    mb_ratio = interval / (interval + 1) (training_loop.py:249-252)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = d_model.init(rng, example_image, example_raw)["params"]
    mb_ratio = tcfg.d_reg_interval / (tcfg.d_reg_interval + 1)
    tx = optax.chain(
        optax.zero_nans(),
        optax.scale_by_adam(b1=tcfg.betas[0] ** mb_ratio,
                            b2=tcfg.betas[1] ** mb_ratio, eps=tcfg.eps),
        optax.scale(-tcfg.d_lr * mb_ratio))
    return DTrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), tx=tx)


def make_gan_train_step(model, smpl, d_model: DualDiscriminator, tcfg,
                        lpips_fn: Optional[Callable] = None,
                        donate: bool = False):
    """Adversarial phase steps over (SHERFTrainState, DTrainState).

    Returns (g_step, d_main_step, d_reg_step):
      g_step(g_state, d_state, batch, rng) -> (g_state, metrics)
        Gmain: reconstruction loss + adv_weight * softplus(-D(fake))
        (loss.py:150-165 with the GAN term enabled) + EMA update.
      d_main_step(d_state, g_state, batch, rng) -> (d_state, metrics)
        Dmain: softplus(D(fake)) + softplus(-D(real)); G re-rendered under
        stop_gradient (the reference re-runs G in the D phase, loss.py:296).
      d_reg_step(d_state, batch) -> (d_state, metrics)
        Dreg: lazy R1 on real images only, loss scaled by gain =
        d_reg_interval (training_loop.py:365).  The caller runs it every
        d_reg_interval steps (python-side cadence, like the phase list).

    D inputs are in [-1, 1]: generator 'image'/'image_raw' already are;
    real images are batch.img * 2 - 1 (loss.py:311-312).  Without the SR
    module image == image_raw, so the raw input is the same tensor.
    """
    from sherf_tpu.train.loss import reconstruction_loss
    from sherf_tpu.train.train_state import ema_beta, ema_update

    beta = ema_beta(tcfg.batch_size, tcfg.ema_kimg)
    g_adv_term, d_term = make_gan_losses(d_model)

    def run_g(g_params, extra_vars, batch, rng):
        return model.apply(
            {"params": g_params, **extra_vars}, batch, smpl, train=True,
            noise_mode="none",
            rngs={"density": rng, "noise": jax.random.fold_in(rng, 1)})

    def real_pair(batch):
        B, H, W = batch.img.shape[:3]
        real = batch.img * 2.0 - 1.0
        return real, real

    def g_loss_fn(g_params, extra_vars, d_params, batch, rng):
        out = run_g(g_params, extra_vars, batch, rng)
        loss, metrics = reconstruction_loss(out, batch, tcfg,
                                            lpips_fn=lpips_fn)
        adv = g_adv_term(d_params, out)
        total = loss + tcfg.adv_weight * adv
        metrics["g_adv"] = adv
        metrics["loss"] = total
        return total, metrics

    def g_step(g_state, d_state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params, g_state.extra_vars, d_state.params, batch, rng)
        g_state = g_state.apply_gradients(grads)
        g_state = g_state.replace(
            ema_params=ema_update(g_state.ema_params, g_state.params, beta))
        return g_state, metrics

    def d_main_step(d_state, g_state, batch, rng):
        gen_out = jax.tree.map(
            jax.lax.stop_gradient,
            run_g(g_state.params, g_state.extra_vars, batch, rng))
        real, real_raw = real_pair(batch)

        def loss_fn(d_params):
            return d_term(d_params, gen_out, real, real_raw,
                          r1_gamma=tcfg.r1_gamma, do_r1=False)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_state.params)
        return d_state.apply_gradients(grads), metrics

    def d_reg_step(d_state, batch):
        real, real_raw = real_pair(batch)
        gain = float(tcfg.d_reg_interval)

        def loss_fn(d_params):
            def d_apply(p, image, image_raw):
                return d_model.apply({"params": p}, image, image_raw)

            r1 = r1_penalty(d_apply, d_params, real, real_raw)
            return r1 * (tcfg.r1_gamma / 2.0) * gain, {"r1_penalty": r1}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_state.params)
        return d_state.apply_gradients(grads), metrics

    donate_g = (0,) if donate else ()
    return (jax.jit(g_step, donate_argnums=donate_g),
            jax.jit(d_main_step, donate_argnums=(0,) if donate else ()),
            jax.jit(d_reg_step, donate_argnums=(0,) if donate else ()))


def make_sharded_gan_steps(model, smpl, d_model: DualDiscriminator, tcfg,
                           mesh, lpips_fn: Optional[Callable] = None,
                           donate: bool = False):
    """Explicit-SPMD adversarial phases: the shard_map counterpart of
    :func:`make_gan_train_step`, mirroring ``make_sharded_train_step``.

    The reference runs D phases on every GPU under manual DDP
    (training_loop.py:243-256,374-384); under GSPMD jit the renderer's
    per-item gathers degrade to the 118-collective-permute regime
    (BASELINE.md), so the G render runs shard_mapped over the (data, rays)
    mesh here too.  D itself is plain conv compute on full images: each
    rays-member sees the identical gathered image, so D terms/grads are
    replicated along 'rays' and DDP-mean along 'data'.

    Same signatures as make_gan_train_step's triple.  Batches must be
    pre-sharded with ``shard_batch(batch, mesh, interleave=True)``.
    """
    from jax.sharding import PartitionSpec as P

    from sherf_tpu.core.diag import overflow_total
    from sherf_tpu.parallel.mesh import batch_pspecs, uninterleave_rays
    from sherf_tpu.train.loss import reconstruction_loss
    from sherf_tpu.train.train_state import ema_beta, ema_update

    beta = ema_beta(tcfg.batch_size, tcfg.ema_kimg)
    rm = mesh.shape["rays"]
    g_adv_term, d_term = make_gan_losses(d_model)

    def shard_rng(rng):
        return jax.random.fold_in(
            rng, jax.lax.axis_index("data") * 4096 + jax.lax.axis_index("rays"))

    def render_full(g_params, extra_vars, batch, rng):
        """Local-shard G render -> full per-item images (gathered over
        'rays', re-ordered), + mutable diag."""
        out, mvars = model.apply(
            {"params": g_params, **extra_vars}, batch, smpl, train=True,
            noise_mode="none", flat_output=True,
            rngs={"density": rng, "noise": jax.random.fold_in(rng, 1)},
            mutable=["diag"])

        def gather(x):
            full = jax.lax.all_gather(x, "rays", axis=1, tiled=True)
            return uninterleave_rays(full, rm)

        B = batch.img.shape[0]
        H, W = batch.img.shape[1:3]
        img = gather(out["image_raw"]).reshape(B, H, W, 3)
        out_img = {"image_raw": img, "image": img,
                   "weights_image": gather(out["weights_image"]).reshape(B, H, W)}
        batch_full = batch.replace(mask_at_box=gather(batch.mask_at_box),
                                   bkgd_msk=gather(batch.bkgd_msk))
        return out_img, batch_full, mvars

    # ---- Gmain: recon + adv_weight * softplus(-D(fake)), sharded like
    # make_sharded_train_step.local_grads
    def g_local_grads(g_params, extra_vars, d_params, batch, rng):
        rng = shard_rng(rng)

        def local_loss(g_params):
            out_img, batch_full, mvars = render_full(
                g_params, extra_vars, batch, rng)
            loss, metrics = reconstruction_loss(out_img, batch_full, tcfg,
                                                lpips_fn=lpips_fn)
            adv = g_adv_term(d_params, out_img)
            total = loss + tcfg.adv_weight * adv
            metrics["g_adv"] = adv
            metrics["loss"] = total
            metrics["overflow"] = overflow_total(mvars.get("diag", {}))
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(
            local_loss, has_aux=True)(g_params)
        grads = jax.lax.pmean(jax.lax.psum(grads, "rays"), "data")
        overflow = jax.lax.pmax(metrics.pop("overflow"), ("data", "rays"))
        metrics = jax.lax.pmean(metrics, "data")
        metrics["overflow"] = overflow
        return metrics, grads

    def g_step(g_state, d_state, batch, rng):
        specs = batch_pspecs(batch)
        metrics, grads = jax.shard_map(
            g_local_grads, mesh=mesh,
            in_specs=(P(), P(), P(), specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(g_state.params, g_state.extra_vars, d_state.params, batch, rng)
        g_state = g_state.apply_gradients(grads)
        g_state = g_state.replace(
            ema_params=ema_update(g_state.ema_params, g_state.params, beta))
        return g_state, metrics

    # ---- Dmain: fake = sharded G render (stopped), real = batch images;
    # D grads identical along 'rays', DDP-mean along 'data'
    def d_local_grads(d_params, g_params, extra_vars, batch, rng):
        rng = shard_rng(rng)
        out_img, _, _ = render_full(g_params, extra_vars, batch, rng)
        gen_out = jax.tree.map(jax.lax.stop_gradient, out_img)
        real = batch.img * 2.0 - 1.0

        def loss_fn(d_params):
            return d_term(d_params, gen_out, real, real,
                          r1_gamma=tcfg.r1_gamma, do_r1=False)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_params)
        grads = jax.lax.pmean(grads, ("data", "rays"))
        metrics = jax.lax.pmean(metrics, ("data", "rays"))
        return metrics, grads

    def d_main_step(d_state, g_state, batch, rng):
        specs = batch_pspecs(batch)
        metrics, grads = jax.shard_map(
            d_local_grads, mesh=mesh,
            in_specs=(P(), P(), P(), specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(d_state.params, g_state.params, g_state.extra_vars, batch, rng)
        return d_state.apply_gradients(grads), metrics

    # ---- Dreg: lazy R1 on real images only (no renderer involved)
    def d_reg_local(d_params, batch):
        real = batch.img * 2.0 - 1.0
        gain = float(tcfg.d_reg_interval)

        def loss_fn(d_params):
            def d_apply(p, image, image_raw):
                return d_model.apply({"params": p}, image, image_raw)

            r1 = r1_penalty(d_apply, d_params, real, real)
            return r1 * (tcfg.r1_gamma / 2.0) * gain, {"r1_penalty": r1}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_params)
        grads = jax.lax.pmean(grads, ("data", "rays"))
        metrics = jax.lax.pmean(metrics, ("data", "rays"))
        return metrics, grads

    def d_reg_step(d_state, batch):
        specs = batch_pspecs(batch)
        metrics, grads = jax.shard_map(
            d_reg_local, mesh=mesh,
            in_specs=(P(), specs),
            out_specs=(P(), P()),
            check_vma=False,
        )(d_state.params, batch)
        return d_state.apply_gradients(grads), metrics

    return (jax.jit(g_step, donate_argnums=(0,) if donate else ()),
            jax.jit(d_main_step, donate_argnums=(0,) if donate else ()),
            jax.jit(d_reg_step, donate_argnums=(0,) if donate else ()))
