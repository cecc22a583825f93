"""Locate the training NaN collapse (r4: D=24 convergence froze at ~step
110 — loss constant, every grad leaf NaN-zeroed by optax.zero_nans).

Reruns the train_convergence setup, but each step ALSO computes raw
grads (no zero_nans) and reports: loss, #NaN/Inf grad leaves (and their
names once), global grad norm, and max |param|.  Run alone on the chip:

    python tools/debug_nan_collapse.py [steps] [H] [D]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sherf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp  # noqa: E402


def main(steps=160, H=256, D=24, lr=2.5e-3, report_every=5):
    import dataclasses

    from sherf_tpu.core.calibrate import calibrate_budgets
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import synthetic_smpl
    from sherf_tpu.train import create_train_state, make_train_step
    from sherf_tpu.train.loss import reconstruction_loss

    smpl = synthetic_smpl(0)
    from sherf_tpu.smpl import smpl_forward, big_pose_params
    bp = big_pose_params()
    t_verts = np.asarray(jax.jit(lambda p, s: smpl_forward(smpl, p, s)[0])(
        jnp.asarray(bp["poses"]), jnp.asarray(bp["shapes"])))
    _, out_sh = prepare_voxel_volume(t_verts)
    cfg = ModelConfig(compute_dtype="bfloat16", render=RenderConfig(
        depth_resolution=D, point_capacity_frac=1 / 16,
        ray_capacity_frac=0.375, exact_capacity_frac=1 / 48,
        density_noise=0.0))
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=H, seed=0)
    fitted, worst = calibrate_budgets([batch], cfg, margin=1.3)
    print(f"budgets: {worst}", file=sys.stderr)
    cfg = dataclasses.replace(cfg, render=fitted)
    tcfg = TrainConfig(batch_size=1, lr=lr)
    model = SHERFGenerator(cfg, out_sh=out_sh)

    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                             smpl))(batch)
    params = dict(variables).pop("params")
    extra = {k: v for k, v in variables.items() if k != "params"}
    state = create_train_state(params, extra, tcfg)
    step = make_train_step(model, smpl, tcfg, donate=False)

    def raw_loss(p, b, rng):
        out = model.apply({"params": p, **extra}, b, smpl, train=True,
                          noise_mode="none",
                          rngs={"density": rng,
                                "noise": jax.random.fold_in(rng, 1)})
        loss, _ = reconstruction_loss(out, b, tcfg)
        return loss

    @jax.jit
    def grad_report(p, b, rng):
        loss, g = jax.value_and_grad(raw_loss)(p, b, rng)
        flat = jax.tree_util.tree_leaves_with_path(g)
        bad = {jax.tree_util.keystr(k): jnp.sum(~jnp.isfinite(v))
               for k, v in flat}
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(jnp.where(
            jnp.isfinite(v), v, 0.0)).astype(jnp.float32))
            for v in jax.tree_util.tree_leaves(g)))
        return loss, bad, gnorm

    @jax.jit
    def param_stats(p):
        leaves = jax.tree_util.tree_leaves(p)
        mx = jnp.max(jnp.stack([jnp.max(jnp.abs(v.astype(jnp.float32)))
                                for v in leaves]))
        nbad = sum(jnp.sum(~jnp.isfinite(v)) for v in leaves)
        return mx, nbad

    rng = jax.random.PRNGKey(7)
    reported_names = False
    for i in range(1, steps + 1):
        rng, sub = jax.random.split(rng)
        if i % report_every == 0 or i == 1:
            loss, bad, gnorm = grad_report(state.params, batch, sub)
            bad = {k: int(v) for k, v in jax.device_get(bad).items()
                   if int(v) > 0}
            mx, nbad = jax.device_get(param_stats(state.params))
            line = (f"step {i}: loss {float(loss):.4f} gnorm "
                    f"{float(gnorm):.3e} |p|max {float(mx):.3e} "
                    f"badparam {int(nbad)} badgradleaves {len(bad)}")
            print(line, file=sys.stderr)
            if bad and not reported_names:
                reported_names = True
                for k, v in sorted(bad.items())[:40]:
                    print(f"   NANGRAD {k}: {v}", file=sys.stderr)
            if bad and len(bad) > 30:
                print("collapse located; stopping", file=sys.stderr)
                break
        state, metrics = step(state, batch, sub)
    print("done", file=sys.stderr)


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
