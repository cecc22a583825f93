"""Generalization-training proof (VERDICT r3 missing #2).

SHERF's claim is ONE-IMAGE GENERALIZABLE human NeRF: trained across many
subjects (reference RenderPeople_dataset.py:151-175, 450 train subjects),
it renders a subject it never saw from a single observation image.  All
prior convergence evidence here was single-scene overfit; this tool trains
on K synthetic subjects (data/synthetic.py multi-person mode: deterministic
per-subject shape+appearance, per-item random pose/cameras) and tracks
masked PSNR on a HELD-OUT subject under HELD-OUT views — improvement can
only come from the model learning to read identity off the observation
image, i.e. generalization.

Run (alone on the chip): python tools/train_generalization.py
Prints one JSON line with the held-out and seen-subject PSNR curves.
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


def main(steps=500, H=128, D=48, subjects=6, lr=2.5e-3, eval_every=50,
         heldout_sid=100, n_eval=4):
    import dataclasses

    from sherf_tpu.core.calibrate import (calibrate_budgets,
                                          calibrate_sparse_caps)
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data.base import collate
    from sherf_tpu.data.synthetic import SyntheticDataset
    from sherf_tpu.eval.metrics import psnr_np
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import synthetic_smpl
    from sherf_tpu.train import create_train_state, make_train_step

    smpl = synthetic_smpl(0)
    train_ds = SyntheticDataset(smpl, H=H, W=H, size=1 << 30, seed=1,
                                subjects=subjects)
    # held-out subject, held-out views: different global subject id AND a
    # different camera/pose stream (seed)
    held_ds = SyntheticDataset(smpl, H=H, W=H, size=n_eval, seed=2,
                               subjects=1, subject_offset=heldout_sid)

    # static voxel geometry must cover EVERY subject (train + held-out)
    sids = list(range(subjects)) + [heldout_sid]
    t_verts_all = [train_ds.subject_canonical(s)[0] for s in sids]
    out_sh = tuple(int(max(prepare_voxel_volume(tv)[1][k]
                           for tv in t_verts_all)) for k in range(3))
    sparse_caps = calibrate_sparse_caps(t_verts_all, 0.005)
    print(f"out_sh {out_sh} sparse_caps {sparse_caps}", file=sys.stderr)

    cfg = ModelConfig(compute_dtype="bfloat16", sparse_caps=sparse_caps,
                      render=RenderConfig(depth_resolution=D,
                                          point_capacity_frac=1 / 16,
                                          ray_capacity_frac=0.5,
                                          exact_capacity_frac=1 / 32,
                                          density_noise=0.0))
    # budgets must cover the worst pose/view drawn during training:
    # calibrate over a spread of batches from both splits, extra margin
    cal_batches = [collate([train_ds[i]]) for i in range(0, 24, 3)]
    cal_batches += [collate([held_ds[i]]) for i in range(n_eval)]
    fitted, worst = calibrate_budgets(cal_batches, cfg, margin=1.5)
    print(f"budgets: {worst}", file=sys.stderr)
    cfg = dataclasses.replace(cfg, render=fitted)
    tcfg = TrainConfig(batch_size=1, lr=lr)
    model = SHERFGenerator(cfg, out_sh=out_sh)

    t0 = time.perf_counter()
    ex = cal_batches[0]
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                             smpl))(ex)
    params = dict(variables).pop("params")
    extra = {k: v for k, v in variables.items() if k != "params"}
    state = create_train_state(params, extra, tcfg)
    step = make_train_step(model, smpl, tcfg)  # donate: platform-gated
    fwd = jax.jit(lambda p, b: model.apply({"params": p, **extra}, b,
                                           smpl)["image_raw"])

    held_batches = [collate([held_ds[i]]) for i in range(n_eval)]
    seen_batches = [collate([train_ds[i]]) for i in range(0, 4)]

    def eval_psnr(p, batches):
        vals = []
        for b in batches:
            pred = np.asarray(fwd(p, b)[0]) / 2.0 + 0.5
            gt = np.asarray(b.img[0])
            mask = np.asarray(b.mask_at_box[0]).reshape(H, H).astype(bool)
            vals.append(psnr_np(pred, gt, mask))
        return float(np.mean(vals))

    held_curve = [(0, eval_psnr(state.params, held_batches))]
    seen_curve = [(0, eval_psnr(state.params, seen_batches))]
    print(f"compile+init: {time.perf_counter() - t0:.1f}s; start held-out "
          f"PSNR {held_curve[0][1]:.2f}", file=sys.stderr)

    rng = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    max_overflow = 0
    for i in range(1, steps + 1):
        rng, sub = jax.random.split(rng)
        batch = collate([train_ds[n_eval + i]])  # never the seen-eval items
        state, metrics = step(state, batch, sub)
        if i % eval_every == 0 or i == steps:
            loss = float(metrics["loss"])
            max_overflow = max(max_overflow, int(metrics["overflow"]))
            hp = eval_psnr(state.params, held_batches)
            sp = eval_psnr(state.params, seen_batches)
            held_curve.append((i, hp))
            seen_curve.append((i, sp))
            print(f"step {i}: loss {loss:.4f} held-out {hp:.2f} dB "
                  f"seen {sp:.2f} dB overflow {max_overflow} "
                  f"({(time.perf_counter() - t0) / i * 1e3:.0f} ms/step)",
                  file=sys.stderr)
            assert np.isfinite(loss), "loss diverged"

    print(json.dumps({
        "steps": steps, "H": H, "D": D, "subjects": subjects,
        "heldout_sid": heldout_sid,
        "held_curve": [[int(s), round(p, 2)] for s, p in held_curve],
        "seen_curve": [[int(s), round(p, 2)] for s, p in seen_curve],
        "held_gain_db": round(held_curve[-1][1] - held_curve[0][1], 2),
        "max_overflow": max_overflow,
        "ms_per_step": round((time.perf_counter() - t0) / steps * 1e3, 1),
    }))


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
