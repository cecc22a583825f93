"""Training orchestration (reference training/training_loop.py:124-634).

Builds the dataset pipeline, generator, optimizer state and compiled train
step, then runs the tick loop: fetch -> step -> EMA -> stats -> periodic
snapshots.  Distribution is handled by the device mesh (parallel/mesh.py);
there is no process-group management.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import numpy as np
import jax

from sherf_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from sherf_tpu.data import DATASETS, collate
from sherf_tpu.data.sampler import InfiniteSampler, PrefetchLoader
from sherf_tpu.features.sparseconv import prepare_voxel_volume
from sherf_tpu.models import SHERFGenerator
from sherf_tpu.parallel import make_mesh, replicate, shard_batch
from sherf_tpu.smpl.model import SMPLModel
from sherf_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from sherf_tpu.train.lpips import LPIPS, lpips_params
from sherf_tpu.train.stats import StatsCollector
from sherf_tpu.train.step import make_train_step
from sherf_tpu.train.train_state import create_train_state


def build_dataset(dcfg: DataConfig, smpl: SMPLModel):
    if dcfg.name == "synthetic":
        from sherf_tpu.data.synthetic import SyntheticDataset

        return SyntheticDataset(smpl, H=dcfg.resolution, W=dcfg.resolution,
                                poses_num=dcfg.poses_num)
    cls = DATASETS[dcfg.name]
    return cls(dcfg.data_root, smpl, split=dcfg.split,
               multi_person=dcfg.multi_person, num_instance=dcfg.num_instance,
               poses_start=dcfg.poses_start, poses_interval=dcfg.poses_interval,
               poses_num=dcfg.poses_num, image_scaling=dcfg.image_scaling,
               white_back=dcfg.white_back, sample_obs_view=dcfg.sample_obs_view,
               fix_obs_view=dcfg.fix_obs_view)


def training_loop(cfg: ModelConfig, tcfg: TrainConfig, dcfg: DataConfig,
                  smpl: SMPLModel, batch_source: Optional[Callable] = None,
                  progress_fn: Optional[Callable] = None,
                  abort_fn: Optional[Callable] = None,
                  profile_steps: Optional[tuple] = None):
    """batch_source: optional () -> SHERFBatch override (tests/synthetic).
    abort_fn: optional () -> bool polled every report interval; True stops
    training after a final snapshot (reference training_loop.py:155,521).
    profile_steps: optional (start, stop) step range captured with
    jax.profiler into run_dir/trace (the reference's record_function /
    Timing/<phase> machinery, training_loop.py:257-262)."""
    run_dir = tcfg.outdir
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "training_options.json"), "w") as f:
        json.dump({"model": cfg.to_json(), "train": str(tcfg), "data": str(dcfg)},
                  f, indent=2)

    mesh = make_mesh(tcfg.mesh_shape if np.prod(tcfg.mesh_shape) ==
                     len(jax.devices()) else None)

    # canonical volume geometry is static per dataset
    from sherf_tpu.smpl.lbs import big_pose_params, smpl_forward
    import jax.numpy as jnp

    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts, voxel_size=cfg.voxel_size)
    model = SHERFGenerator(cfg, out_sh=out_sh)

    # data
    if batch_source is None:
        dataset = build_dataset(dcfg, smpl)
        loader = PrefetchLoader(dataset, tcfg.batch_size, collate,
                                InfiniteSampler(len(dataset), seed=tcfg.seed),
                                num_workers=dcfg.num_workers)
        batch_source = lambda: next(loader)

    example = batch_source()

    # model / state
    variables = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(tcfg.seed), b, smpl))(example)
    params = dict(variables).pop("params")
    extra = {k: v for k, v in variables.items() if k != "params"}
    state = create_train_state(params, extra, tcfg)
    if tcfg.resume:
        state = restore_checkpoint(tcfg.resume, state)
        print(f"resumed from {tcfg.resume} at step {int(state.step)}")
    state = replicate(state, mesh)

    lp = lpips_params()
    lpips_fn = None
    if lp is not None:
        lpips_model = LPIPS()
        lpips_fn = lambda a, b: lpips_model.apply({"params": lp}, a, b)

    step_fn = make_train_step(model, smpl, tcfg, lpips_fn=lpips_fn)
    stats = StatsCollector(run_dir)

    total_steps = tcfg.total_kimg * 1000 // tcfg.batch_size
    report_every = max(100 // tcfg.batch_size, 1)
    snapshot_every = max(tcfg.kimg_per_tick * tcfg.snapshot_ticks * 1000
                         // tcfg.batch_size, 1)

    rng = jax.random.PRNGKey(tcfg.seed)
    t_tick = time.time()
    start_step = int(state.step)
    aborted = False
    for step in range(start_step, total_steps):
        if profile_steps is not None and step == profile_steps[0]:
            jax.profiler.start_trace(os.path.join(run_dir, "trace"))
        t0 = time.time()
        batch = shard_batch(batch_source(), mesh)
        t1 = time.time()
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        # dispatch is async; the data-fetch share of the wall clock is still
        # the scheduling-relevant signal (reference Timing/data_fetch)
        stats.report(metrics, prefix="Loss/")
        stats.report({"data_fetch": t1 - t0, "step_dispatch": time.time() - t1},
                     prefix="Timing/")
        if profile_steps is not None and step + 1 == profile_steps[1]:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(), state.params)
            jax.profiler.stop_trace()
            print(f"profiler trace -> {os.path.join(run_dir, 'trace')}")

        if (step + 1) % report_every == 0:
            stats.report_resources()
            means = stats.flush(step + 1)
            imgs = (step + 1) * tcfg.batch_size
            sec_kimg = (time.time() - t_tick) / max(report_every * tcfg.batch_size, 1) * 1000
            t_tick = time.time()
            line = " ".join(f"{k.split('/')[-1]} {v:.4f}"
                            for k, v in means.items()
                            if k.startswith("Loss/"))
            print(f"kimg {imgs / 1000:.2f} sec/kimg {sec_kimg:.1f} {line}")
            if progress_fn is not None:
                progress_fn(step + 1, means)
            aborted = abort_fn is not None and bool(abort_fn())

        if (step + 1) % snapshot_every == 0 or step + 1 == total_steps or aborted:
            path = save_checkpoint(os.path.join(run_dir, "checkpoints"), state)
            print(f"snapshot -> {path}")
        if aborted:
            print("abort_fn requested stop; exiting training loop")
            break

    stats.close()
    return state
