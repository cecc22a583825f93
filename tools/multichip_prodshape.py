"""Production-shape multi-chip proof on the virtual CPU mesh.

Renders a full 512x512x48 frame (the reference's shipped render config,
train.py:349-350) through the shard_map render over a (1 x 8) ray mesh and
checks it against the single-device result, then runs one shard_map train
step at (8 data x 1) and checks the DDP-mean loss against per-item plain
steps.  Writes a JSON summary line for BASELINE.md.

Run:  python tools/multichip_prodshape.py [--res 512 --depth 48
          --train-res 256 --train-depth 24 --train-batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sherf_tpu_jax_cache")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--depth", type=int, default=48)
    ap.add_argument("--train-res", type=int, default=256)
    ap.add_argument("--train-depth", type=int, default=24)
    ap.add_argument("--train-batch", type=int, default=8)
    a = ap.parse_args()

    from sherf_tpu.cli.common import build_model, calibrated_config, \
        resolve_smpl
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.parallel import (make_mesh, make_sharded_render, replicate,
                                    shard_batch)
    from sherf_tpu.train import create_train_state, make_train_step
    from sherf_tpu.train.step import make_sharded_train_step

    smpl = resolve_smpl(None)
    summary = {}

    # ---- render at production shape, mesh (1 data x 8 rays)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=a.depth,
                                          density_noise=0.0))
    batch = make_synthetic_batch(smpl, batch_size=1, H=a.res, W=a.res, seed=0)
    cfg = calibrated_config(cfg, [batch], margin=1.3)
    model, out_sh, cfg = build_model(cfg, smpl)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(batch)

    t0 = time.time()
    ref = jax.jit(lambda v, b: model.apply(v, b, smpl))(variables, batch)
    ref_img = np.asarray(ref["image_raw"])
    t_single = time.time() - t0

    mesh = make_mesh((1, 8))
    vars_r = replicate(variables, mesh)
    sharded = shard_batch(batch, mesh, interleave=True)
    t0 = time.time()
    out = make_sharded_render(model, smpl, mesh)(vars_r, sharded)
    out_img = np.asarray(out["image_raw"])
    t_shard = time.time() - t0

    dif = np.abs(out_img - ref_img)
    mse = float((dif ** 2).mean())
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    summary["render"] = dict(res=a.res, depth=a.depth, mesh="1x8",
                             max_abs_diff=float(dif.max()),
                             psnr_vs_single=round(psnr, 2),
                             wall_single_s=round(t_single, 1),
                             wall_sharded_s=round(t_shard, 1))
    assert psnr > 60, f"sharded render diverges: PSNR {psnr:.1f}"
    print("render:", summary["render"])

    # ---- train step at scale, mesh (8 data x 1)
    tcfg = TrainConfig(batch_size=a.train_batch, lr=1e-3)
    # wider prune step margin: at train-depth 24 the per-sample depth step
    # exceeds the default 0.06 m occupancy dilation
    cfg_t = ModelConfig(render=RenderConfig(depth_resolution=a.train_depth,
                                            density_noise=0.0,
                                            prune_step_margin=0.1))
    # moderate pose scale: the occupancy prune grid covers a 2.4 m cube,
    # and extreme random synthetic poses can exceed a real body's span
    tb = make_synthetic_batch(smpl, batch_size=a.train_batch,
                              H=a.train_res, W=a.train_res, seed=1,
                              pose_scale=0.15)
    cfg_t = calibrated_config(cfg_t, [tb], margin=1.3)
    model_t, _, cfg_t = build_model(cfg_t, smpl)
    variables = jax.jit(lambda b: model_t.init(jax.random.PRNGKey(0), b, smpl))(
        jax.tree.map(lambda x: x[:1], tb))
    params = dict(variables)["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    rng = jax.random.PRNGKey(3)

    plain = make_train_step(model_t, smpl, tcfg, donate=False)
    losses = []
    for b in range(a.train_batch):
        item = jax.tree.map(lambda x: x[b:b + 1], tb)
        _, m = plain(create_train_state(params, extra, tcfg), item, rng)
        losses.append(float(m["loss"]))

    mesh_t = make_mesh((8, 1))
    state = replicate(create_train_state(params, extra, tcfg), mesh_t)
    stb = shard_batch(tb, mesh_t, interleave=True)
    step = make_sharded_train_step(model_t, smpl, tcfg, mesh_t, donate=False)
    t0 = time.time()
    _, metrics = step(state, stb, rng)
    loss = float(metrics["loss"])
    t_step = time.time() - t0
    expected = float(np.mean(losses))
    rel = abs(loss - expected) / max(abs(expected), 1e-9)
    summary["train"] = dict(res=a.train_res, depth=a.train_depth,
                            batch=a.train_batch, mesh="8x1",
                            loss=round(loss, 5), ddp_mean=round(expected, 5),
                            rel_err=float(rel), wall_step_s=round(t_step, 1))
    assert rel < 1e-3, f"sharded train loss off DDP mean by {rel:.2e}"
    print("train:", summary["train"])

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
