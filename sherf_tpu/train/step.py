"""The compiled training step.

Replaces the reference's manual DDP (flatten grads -> dist.all_reduce ->
nan_to_num -> unflatten, training_loop.py:374-384) with jit over a device
mesh: params are replicated, the batch is sharded over the 'data' axis and
rays over the 'rays' axis; XLA inserts the gradient reductions over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sherf_tpu.core.config import TrainConfig
from sherf_tpu.core.types import SHERFBatch
from sherf_tpu.smpl.model import SMPLModel
from sherf_tpu.train.loss import reconstruction_loss
from sherf_tpu.train.train_state import SHERFTrainState, ema_beta, ema_update


def make_train_step(model, smpl: SMPLModel, tcfg: TrainConfig,
                    lpips_fn: Optional[Callable] = None,
                    donate: bool = True) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics)."""
    beta = ema_beta(tcfg.batch_size, tcfg.ema_kimg)

    def loss_fn(params, extra_vars, batch: SHERFBatch, rng):
        variables = {"params": params, **extra_vars}
        out = model.apply(
            variables, batch, smpl, train=True,
            noise_mode="none",  # run_G uses noise_mode='none' (loss.py:82)
            rngs={"density": rng, "noise": jax.random.fold_in(rng, 1)})
        loss, metrics = reconstruction_loss(out, batch, tcfg, lpips_fn=lpips_fn)
        return loss, metrics

    def train_step(state: SHERFTrainState, batch: SHERFBatch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.extra_vars, batch, rng)
        state = state.apply_gradients(grads)
        state = state.replace(ema_params=ema_update(state.ema_params,
                                                    state.params, beta))
        metrics["grad_norm"] = optax_global_norm(grads)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
