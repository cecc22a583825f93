"""Training-step throughput at the shipped config (single chip).

The reference trains 512x512 renders at batch 4 over 4 GPUs (train_*.sh),
i.e. one 512x512x48 sample per device per step; this times our jitted
train step (forward + backward + Adam + EMA) at exactly that per-chip
load and reports sec/kimg (the reference's progress metric,
training_loop.py:506).

Run: python tools/bench_train.py  (alone — one TPU user at a time)
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


def main(H=512, W=512, D=48, iters=5, calibrate=True, margin=1.15):
    import dataclasses

    from sherf_tpu.core.calibrate import calibrate_budgets
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params
    from sherf_tpu.train import create_train_state, make_train_step

    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts)
    cfg = ModelConfig(compute_dtype="bfloat16", render=RenderConfig(
        depth_resolution=D, point_capacity_frac=1 / 16,
        ray_capacity_frac=0.375, exact_capacity_frac=1 / 48))
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=0)
    if calibrate:
        # same scene-fitted budgets as bench.py (production --calibrate_budgets
        # workflow): training sizes its static capacities from the data too
        fitted, worst = calibrate_budgets([batch], cfg, margin=margin)
        print(f"budgets: rays {worst['rays']}, voxel {worst['voxel']}, "
              f"exact ~{worst['exact']} (margin {margin})", file=sys.stderr)
        cfg = dataclasses.replace(cfg, render=fitted)
    tcfg = TrainConfig(batch_size=1, lr=2.5e-3)
    model = SHERFGenerator(cfg, out_sh=out_sh)

    scfg = ModelConfig(compute_dtype="bfloat16",
                       render=RenderConfig(depth_resolution=4))
    small = SHERFGenerator(scfg, out_sh=out_sh)
    tiny = make_synthetic_batch(smpl, batch_size=1, H=8, W=8, seed=0)
    t0 = time.perf_counter()
    variables = jax.jit(lambda b: small.init(jax.random.PRNGKey(0), b,
                                             smpl))(tiny)
    params = variables.pop("params")
    state = create_train_state(params, dict(variables), tcfg)
    step = make_train_step(model, smpl, tcfg, donate=False)
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"(loss {float(metrics['loss']):.3f})", file=sys.stderr)

    # latency (readback every step)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
        np.asarray(metrics["loss"])
    lat = (time.perf_counter() - t0) / iters

    # sustained: steps chain through the state (step i+1 consumes step i's
    # output), so dispatching back-to-back and reading the last loss times
    # the true pipeline rate — the real training loop runs async like this
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
    np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt * 1e3:.1f} ms sustained ({lat * 1e3:.1f} ms "
          f"latency) -> {dt * 1000:.1f} sec/kimg/chip "
          f"({1.0 / dt:.2f} imgs/sec/chip)")


if __name__ == "__main__":
    main()
