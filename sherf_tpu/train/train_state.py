"""Optimizer / EMA / LR schedule state.

Reference training recipe (train_*.sh + training_loop.py):
  Adam lr 2.5e-3, betas (0, 0.99), eps 1e-8 (train.py:239,284)
  StepLR x0.5 every 20000 // batch_size steps (training_loop.py:254)
  G_ema with ema_kimg = 10 (training_loop.py:392-403)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
from flax import struct
import jax
import jax.numpy as jnp
import optax

from sherf_tpu.core.config import TrainConfig


def step_lr_schedule(base_lr: float, decay_images: int, batch_size: int,
                     factor: float = 0.5):
    """lr * factor^(step // (decay_images // batch_size))."""
    interval = max(decay_images // batch_size, 1)

    def schedule(step):
        return base_lr * (factor ** (step // interval))

    return schedule


class SHERFTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    # mutable collections (batch_stats for BN, noise buffers, mapping w_avg)
    extra_vars: Dict = struct.field(default_factory=dict)
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


def create_train_state(params, extra_vars: Dict, tcfg: TrainConfig) -> SHERFTrainState:
    # 'diag' is the per-apply overflow-counter collection (core/diag.py):
    # ephemeral output state, never meaningful input.  Carrying it through
    # the train state (and therefore through checkpoints) poisoned later
    # reads — sow(reduce_fn=maximum) folds the stale restored counters
    # into every fresh frame's, so cli/eval reported a training-time
    # overflow against freshly calibrated budgets forever (r5 lifecycle
    # smoke).
    extra_vars = {k: v for k, v in extra_vars.items() if k != "diag"}
    schedule = step_lr_schedule(tcfg.lr, tcfg.lr_decay_images, tcfg.batch_size,
                                tcfg.lr_decay_factor)
    tx = optax.chain(
        # nan_to_num on grads (training_loop.py:380)
        optax.zero_nans(),
        optax.scale_by_adam(b1=tcfg.betas[0], b2=tcfg.betas[1], eps=tcfg.eps),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )
    return SHERFTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        # a true copy: aliased buffers break donation (donated twice)
        ema_params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        opt_state=tx.init(params),
        extra_vars=extra_vars,
        tx=tx,
    )


def ema_beta(batch_size: int, ema_kimg: float) -> float:
    """0.5 ** (batch / (ema_kimg * 1000)) (training_loop.py:395-399)."""
    return 0.5 ** (batch_size / max(ema_kimg * 1000.0, 1e-8))


def ema_update(ema_params, params, beta: float):
    return jax.tree.map(lambda e, p: p + (e - p) * beta, ema_params, params)
