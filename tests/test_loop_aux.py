"""Training-loop auxiliary subsystems (SURVEY §5): per-phase Timing/
scalars, Resources/ memory reporting, abort_fn early stop with a final
snapshot (reference training_loop.py:155,257-262,509-521)."""

import glob
import json
import os

import jax
import pytest
import jax.numpy as jnp

from sherf_tpu.core.config import (DataConfig, ModelConfig, RenderConfig,
                                   TrainConfig)
from sherf_tpu.data import make_synthetic_batch
from sherf_tpu.smpl import synthetic_smpl
from sherf_tpu.train.loop import training_loop


@pytest.mark.heavy
def test_loop_timing_resources_abort(tmp_path):
    smpl = synthetic_smpl(0)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=4,
                                          point_capacity_frac=0.25,
                                          density_noise=0.0))
    # batch_size 1, report_every = max(100//1,1) = 100 steps/tick is too
    # long for a test; kimg_per_tick/batch keep the loop at 4 total steps
    tcfg = TrainConfig(total_kimg=1, batch_size=256, lr=1e-3,
                       outdir=str(tmp_path), kimg_per_tick=1,
                       snapshot_ticks=50, ema_kimg=0.1)
    dcfg = DataConfig(name="synthetic")

    # batch must divide the test mesh's 8-way data axis
    batch = make_synthetic_batch(smpl, batch_size=8, H=16, W=16, seed=0)
    calls = []

    def abort_fn():
        calls.append(1)
        return len(calls) >= 2  # stop at the second report

    state = training_loop(cfg, tcfg, dcfg, smpl,
                          batch_source=lambda: batch,
                          abort_fn=abort_fn)
    # batch_size 256 -> total_steps = 1000//256 = 3, report_every = 1:
    # abort at step 2 of 3
    assert int(state.step) == 2
    assert calls, "abort_fn was never polled"

    with open(os.path.join(str(tmp_path), "stats.jsonl")) as f:
        recs = [json.loads(x) for x in f if x.strip()]
    assert recs, "no stats flushed"
    keys = set().union(*(r.keys() for r in recs))
    assert "Timing/data_fetch" in keys and "Timing/step_dispatch" in keys
    # snapshot wall-time phase (reference Timing/<phase>); the fwd_bwd/opt/
    # ema breakdown is covered cheaply by
    # test_train.py::test_phase_fns_compose_to_fused_step — running the
    # loop with phase_timing=True here would double-compile the 8-device
    # shard_map grad (~15 min on a 1-CPU box)
    assert "Timing/snapshot" in keys
    assert "Resources/cpu_mem_gb" in keys
    assert any(k.startswith("Loss/") for k in keys)

    # abort still wrote a final snapshot despite snapshot_ticks being huge
    assert glob.glob(os.path.join(str(tmp_path), "checkpoints", "*"))
