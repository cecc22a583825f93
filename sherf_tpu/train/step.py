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


def donate_default() -> bool:
    """Platform-gated donation default.

    Buffer donation is numerically UNSOUND on the tunneled `axon` backend
    (r4: the donated train step's trajectory diverges from the undonated
    one within ~25 steps and deterministically collapses to a dead-relu
    frozen state — loss bit-frozen, all-zero gradients — at ~step 110 of
    the 256^2 D=24 overfit; the undonated step converges monotonically on
    the same seed/program).  Donation stays on for real backends, where it
    halves train-state memory; SHERF_DONATE=0/1 overrides either way.
    """
    import os

    env = os.environ.get("SHERF_DONATE")
    if env is not None:
        return env != "0"
    return jax.default_backend() != "axon"


def _make_loss_fn(model, smpl: SMPLModel, tcfg: TrainConfig,
                  lpips_fn: Optional[Callable] = None) -> Callable:
    def loss_fn(params, extra_vars, batch: SHERFBatch, rng):
        from sherf_tpu.core.diag import overflow_total

        variables = {"params": params, **extra_vars}
        out, mvars = model.apply(
            variables, batch, smpl, train=True,
            noise_mode="none",  # run_G uses noise_mode='none' (loss.py:82)
            rngs={"density": rng, "noise": jax.random.fold_in(rng, 1)},
            mutable=["diag"])
        loss, metrics = reconstruction_loss(out, batch, tcfg, lpips_fn=lpips_fn)
        # budget-truncation watchdog: nonzero => corrupted samples this step
        metrics["overflow"] = overflow_total(mvars.get("diag", {}))
        return loss, metrics

    return loss_fn


def make_train_step(model, smpl: SMPLModel, tcfg: TrainConfig,
                    lpips_fn: Optional[Callable] = None,
                    donate: bool = None) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics).

    ``donate`` defaults to :func:`donate_default` — buffer donation is
    numerically UNSOUND on the tunneled `axon` backend (r4 find: the
    donated step's training trajectory diverges from the undonated one
    from the first steps and deterministically collapses into a dead-relu
    frozen state at ~step 110 of the D=24 overfit; donate=False converges
    monotonically on the same seed).  On real `tpu`/`cpu` backends
    donation halves state memory and stays on by default.
    """
    beta = ema_beta(tcfg.batch_size, tcfg.ema_kimg)
    loss_fn = _make_loss_fn(model, smpl, tcfg, lpips_fn)

    def train_step(state: SHERFTrainState, batch: SHERFBatch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.extra_vars, batch, rng)
        state = state.apply_gradients(grads)
        state = state.replace(ema_params=ema_update(state.ema_params,
                                                    state.params, beta))
        metrics["grad_norm"] = optax_global_norm(grads)
        return state, metrics

    if donate is None:
        donate = donate_default()
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_phase_fns(model, smpl: SMPLModel, tcfg: TrainConfig,
                   lpips_fn: Optional[Callable] = None, mesh=None):
    """Separately-jitted training phases for per-phase device timing
    (reference ``Timing/<phase>`` from CUDA events,
    training_loop.py:257-262,595-600 — there the phases are separate
    launches; here the production step is ONE fused XLA program, so a
    breakdown requires dispatching the phases as separate programs).

    ``mesh``: None or a unit mesh -> plain-jit phases; a multi-device
    (data, rays) mesh -> the grad phase is the same shard_map body the
    fused sharded step uses (grad psum/pmean included), so the breakdown
    reflects the real multi-chip step.

    Returns (grad_fn, opt_fn, ema_fn):
      grad_fn(params, extra_vars, batch, rng) -> ((loss, metrics), grads)
      opt_fn(state, grads)                    -> state
      ema_fn(state)                           -> state
    ``opt_fn(state, grads)`` then ``ema_fn`` compose to exactly the fused
    step's update, so a timing step can REPLACE a fused step without
    changing the training trajectory (donation off: the split programs are
    diagnostic, compiled once on first use by the loop's phase_timing
    mode).
    """
    beta = ema_beta(tcfg.batch_size, tcfg.ema_kimg)
    if mesh is not None and int(mesh.devices.size) > 1:
        from jax.sharding import PartitionSpec as P

        from sherf_tpu.parallel.mesh import batch_pspecs

        local_grads = _make_local_grads(model, smpl, tcfg, mesh, lpips_fn)

        def _grad(params, extra_vars, batch, rng):
            metrics, grads = jax.shard_map(
                local_grads, mesh=mesh,
                in_specs=(P(), P(), batch_pspecs(batch), P()),
                out_specs=(P(), P()), check_vma=False,
            )(params, extra_vars, batch, rng)
            return (metrics["loss"], metrics), grads

        grad_fn = jax.jit(_grad)
    else:
        loss_fn = _make_loss_fn(model, smpl, tcfg, lpips_fn)
        grad_fn = jax.jit(lambda params, extra_vars, batch, rng:
                          jax.value_and_grad(loss_fn, has_aux=True)(
                              params, extra_vars, batch, rng))
    opt_fn = jax.jit(lambda state, grads: state.apply_gradients(grads))
    ema_fn = jax.jit(lambda state: state.replace(
        ema_params=ema_update(state.ema_params, state.params, beta)))
    return grad_fn, opt_fn, ema_fn


def _make_local_grads(model, smpl: SMPLModel, tcfg: TrainConfig, mesh,
                      lpips_fn: Optional[Callable] = None) -> Callable:
    """Per-shard loss+grad body shared by the fused sharded step and the
    sharded phase-timing fns: local forward/backward, ray all_gather for
    the image-space loss, gradient psum/pmean on exit."""
    from sherf_tpu.parallel.mesh import uninterleave_rays

    rm = mesh.shape["rays"]

    def local_loss(params, extra_vars, batch: SHERFBatch, rng):
        from sherf_tpu.core.diag import overflow_total

        variables = {"params": params, **extra_vars}
        out, mvars = model.apply(
            variables, batch, smpl, train=True, noise_mode="none",
            flat_output=True,
            rngs={"density": rng, "noise": jax.random.fold_in(rng, 1)},
            mutable=["diag"])

        def gather(x):  # (B_loc, N_loc, ...) -> (B_loc, N, ...) in ray order
            full = jax.lax.all_gather(x, "rays", axis=1, tiled=True)
            return uninterleave_rays(full, rm)

        B = batch.img.shape[0]
        H, W = batch.img.shape[1:3]
        out_img = {
            "image_raw": gather(out["image_raw"]).reshape(B, H, W, 3),
            "weights_image": gather(out["weights_image"]).reshape(B, H, W),
        }
        batch_full = batch.replace(mask_at_box=gather(batch.mask_at_box),
                                   bkgd_msk=gather(batch.bkgd_msk))
        loss, metrics = reconstruction_loss(out_img, batch_full, tcfg,
                                            lpips_fn=lpips_fn)
        metrics["overflow"] = overflow_total(mvars.get("diag", {}))
        return loss, metrics

    def local_grads(params, extra_vars, batch, rng):
        # decorrelate per-shard sample noise
        rng = jax.random.fold_in(
            rng, jax.lax.axis_index("data") * 4096 + jax.lax.axis_index("rays"))
        (loss, metrics), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, extra_vars, batch, rng)
        # each ray lives on exactly one 'rays' member -> sum; data shards
        # each hold a mean over B/dm images -> mean.  Composed as ONE
        # fused all-reduce over the whole mesh (sum over rays and mean
        # over data == global sum / dm): the psum('rays') -> pmean('data')
        # pair emitted two full-size all-reduces — 333.6 MB/step at mesh
        # 2x4 vs 166.8 MB of gradient (tools/collective_budget.py)
        dm = mesh.shape["data"]
        grads = jax.tree.map(lambda g: g * (1.0 / dm),
                             jax.lax.psum(grads, ("rays", "data")))
        # overflow is a worst-case watchdog: take the max across all shards
        overflow = jax.lax.pmax(metrics.pop("overflow"), ("data", "rays"))
        metrics = jax.lax.pmean(metrics, "data")
        metrics["overflow"] = overflow
        return metrics, grads

    return local_grads


def make_sharded_train_step(model, smpl: SMPLModel, tcfg: TrainConfig,
                            mesh, lpips_fn: Optional[Callable] = None,
                            donate: bool = None) -> Callable:
    """Explicit-SPMD train step: shard_map over the (data, rays) mesh.

    GSPMD cannot prove that the renderer's per-batch-item gathers (feature
    banks, sparse-volume readouts — deliberately python-looped over B, see
    nerf/renderer.py setup notes) stay within the local batch shard, so it
    either replicates their compute or inserts per-item collective-permutes
    (measured: 118 permutes for one step at mesh 4x2,
    tools/inspect_sharded_hlo.py).  Under shard_map every device executes
    the model on its LOCAL (B/dm, N/rm) shard only — the loops run over the
    local batch, zero collectives inside the model — and the only
    cross-device traffic is the ray all_gather for the image-space loss and
    one gradient psum/pmean, exactly the DP story of the reference's manual
    all_reduce (training_loop.py:374-384) plus our ray axis.

    Expects the batch pre-sharded by ``shard_batch(batch, mesh,
    interleave=True)``: ray fields round-robin across 'rays' so per-shard
    static point budgets stay balanced.  Batch/ray dims must divide the
    mesh axes.  Gradients/metrics are bitwise identical across devices on
    exit (psum'd), numerically ≈ the single-device step (reduction order
    differs).
    """
    from jax.sharding import PartitionSpec as P

    from sherf_tpu.parallel.mesh import batch_pspecs

    beta = ema_beta(tcfg.batch_size, tcfg.ema_kimg)
    local_grads = _make_local_grads(model, smpl, tcfg, mesh, lpips_fn)

    def train_step(state: SHERFTrainState, batch: SHERFBatch, rng):
        specs = batch_pspecs(batch)
        metrics, grads = jax.shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P(), specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(state.params, state.extra_vars, batch, rng)
        state = state.apply_gradients(grads)
        state = state.replace(ema_params=ema_update(state.ema_params,
                                                    state.params, beta))
        metrics["grad_norm"] = optax_global_norm(grads)
        return state, metrics

    if donate is None:
        donate = donate_default()
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
