"""Training-convergence proof on real hardware (VERDICT r1 weak #4).

Overfits the synthetic scene for a few hundred steps at a production-like
config and records the masked-PSNR curve — the de-facto proof that
grad-through-compaction + structured adjoints + bf16 banks train correctly
(the reference's evidence is its published checkpoints; ours is this curve,
recorded in BASELINE.md).

Run: python tools/train_convergence.py [steps] [H] [D]  (alone on the chip)
Prints one JSON line: {"psnr_curve": [...], "start": s, "end": e, ...}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sherf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp  # noqa: E402


def main(steps=300, H=256, D=48, lr=2.5e-3, eval_every=25):
    import dataclasses

    from sherf_tpu.core.calibrate import calibrate_budgets
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.eval.metrics import psnr_np
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
        ray_capacity_frac=0.375, exact_capacity_frac=1 / 48,
        density_noise=0.0))
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=H, seed=0)
    fitted, worst = calibrate_budgets([batch], cfg, margin=1.3)
    print(f"budgets: {worst}", file=sys.stderr)
    cfg = dataclasses.replace(cfg, render=fitted)
    tcfg = TrainConfig(batch_size=1, lr=lr)
    model = SHERFGenerator(cfg, out_sh=out_sh)

    t0 = time.perf_counter()
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(batch)
    params = dict(variables).pop("params")
    extra = {k: v for k, v in variables.items() if k != "params"}
    state = create_train_state(params, extra, tcfg)
    step = make_train_step(model, smpl, tcfg)  # donate: platform-gated
    #   (SHERF_DONATE=1 reproduces the r4 axon donation collapse: loss
    #   freezes dead at ~step 110 of this very run)
    fwd = jax.jit(lambda p, b: model.apply({"params": p, **extra}, b, smpl))

    gt = np.asarray(batch.img[0])
    mask = np.asarray(batch.mask_at_box[0]).reshape(H, H).astype(bool)

    def eval_psnr(p):
        pred = np.asarray(fwd(p, batch)["image_raw"][0]) / 2.0 + 0.5
        return psnr_np(pred, gt, mask)

    curve = [(0, eval_psnr(state.params))]
    print(f"compile+init: {time.perf_counter() - t0:.1f}s; "
          f"start PSNR {curve[0][1]:.2f}", file=sys.stderr)

    rng = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    losses = []
    for i in range(1, steps + 1):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        if i % eval_every == 0 or i == steps:
            loss = float(metrics["loss"])
            losses.append(loss)
            p = eval_psnr(state.params)
            curve.append((i, p))
            print(f"step {i}: loss {loss:.4f} psnr {p:.2f} "
                  f"({(time.perf_counter() - t0) / i * 1e3:.0f} ms/step)",
                  file=sys.stderr)
            assert np.isfinite(loss), "loss diverged"

    print(json.dumps({
        "steps": steps, "H": H, "D": D,
        "psnr_curve": [[int(s), round(p, 2)] for s, p in curve],
        "start_psnr": round(curve[0][1], 2),
        "end_psnr": round(curve[-1][1], 2),
        "final_loss": losses[-1] if losses else None,
        "ms_per_step": round((time.perf_counter() - t0) / steps * 1e3, 1),
    }))


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
