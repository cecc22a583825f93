"""Per-step collective TRAFFIC accounting for the multi-chip train step.

Extends tools/inspect_sharded_hlo.py (which counts ops) with byte volumes:
compiles the production shard_map train step over an N-device (data, rays)
mesh and reports, per collective kind, the op count and the total bytes
moved per step — the numbers a pod run's ICI utilisation can be checked
against.

Comparison point: the reference's manual DDP all_reduce moves the full
flattened gradient vector once per step (training_loop.py:374-384), i.e.
~= total param bytes; our step's gradient psum/pmean is the same volume,
plus one tiled per-ray all_gather for the image-space loss (the ray axis
the reference doesn't have).  Printed alongside for scale.

Usage:
    python tools/collective_budget.py [--batch 8] [--res 64] [--depth 8]
        [--mesh 2x4] [--json out.json]
"""

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = int(os.environ.get("SHERF_HLO_DEVICES", "8"))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sherf_tpu_jax_cache")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "c64": 8, "c128": 16}

# output of a collective: e.g. "f32[8,256]{1,0}" or a tuple
# "(f32[128]{0}, f32[64,3]{1,0})"
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_text):
        if dt not in _DTYPE_BYTES:
            continue
        numel = 1
        for d in dims.split(","):
            if d:
                numel *= int(d)
        total += numel * _DTYPE_BYTES[dt]
    return total


def collective_traffic(hlo_text: str):
    """{op: {"count": n, "bytes": total_output_bytes, "largest": [...]}}

    Bytes are the collective's OUTPUT buffer size per device — the
    figure to compare against link bandwidth x step time (all-gather
    output = gathered size; all-reduce output = reduced size ~= input).
    """
    out = {}
    for line in hlo_text.splitlines():
        m = re.search(r"=\s+((?:\([^)]*\)|\S+))\s+(all-gather|all-reduce|"
                      r"all-to-all|collective-permute|reduce-scatter)\(",
                      line)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        b = shape_bytes(shape)
        rec = out.setdefault(op, {"count": 0, "bytes": 0, "largest": []})
        rec["count"] += 1
        rec["bytes"] += b
        rec["largest"].append((b, shape))
    for rec in out.values():
        rec["largest"] = [s for _, s in
                          sorted(rec["largest"], reverse=True)[:5]]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--mesh", default="2x4")
    ap.add_argument("--json", default=None)
    a = ap.parse_args()

    from sherf_tpu.cli.common import build_model, resolve_smpl
    from sherf_tpu.core.config import ModelConfig, RenderConfig, TrainConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.parallel.mesh import (batch_pspecs, interleave_rays,
                                         make_mesh, replicate, shard_batch)
    from sherf_tpu.train.step import make_sharded_train_step
    from sherf_tpu.train.train_state import create_train_state

    dm, rm = (int(x) for x in a.mesh.split("x"))
    mesh = make_mesh((dm, rm))
    smpl = resolve_smpl(None)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=a.depth,
                                          density_noise=0.0))
    model, out_sh, cfg = build_model(cfg, smpl)
    batch = make_synthetic_batch(smpl, batch_size=a.batch, H=a.res, W=a.res,
                                 seed=0)
    batch = shard_batch(batch, mesh, interleave=True)

    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(
        jax.tree.map(lambda x: x[:1], batch))
    params = dict(variables)["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    tcfg = TrainConfig(batch_size=a.batch)
    state = replicate(create_train_state(params, extra, tcfg), mesh)
    step = make_sharded_train_step(model, smpl, tcfg, mesh, donate=False)
    hlo = step.lower(state, batch, jax.random.PRNGKey(0)).compile().as_text()

    traffic = collective_traffic(hlo)
    param_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                      for x in jax.tree.leaves(params))
    n_rays = a.res * a.res

    total_bytes = sum(r["bytes"] for r in traffic.values())
    total_count = sum(r["count"] for r in traffic.values())
    print(f"sharded train step, mesh {dm}x{rm} (data x rays), "
          f"batch {a.batch}, {a.res}x{a.res}x{a.depth}:")
    for op, rec in sorted(traffic.items()):
        print(f"  {op:20s} x{rec['count']:3d}  "
              f"{rec['bytes'] / 1e6:8.2f} MB/step  "
              f"largest: {', '.join(rec['largest'][:3])}")
    print(f"  {'TOTAL':20s} x{total_count:3d}  {total_bytes / 1e6:8.2f} MB/step")
    print(f"reference manual-DDP all_reduce volume (= flattened grads "
          f"~= param bytes): {param_bytes / 1e6:.2f} MB/step "
          f"(training_loop.py:374-384)")
    print(f"ray all_gather payload (image-space loss): "
          f"{n_rays * a.batch * (3 + 1) * 4 / 1e6:.2f} MB/step at this shape")
    # the design claim this tool guards: NO collective-permutes (the
    # GSPMD-partitioned jit of the same model emitted 118 of them at 4x2 —
    # see BASELINE.md "Multi-chip scaling design")
    assert "collective-permute" not in traffic, traffic.keys()

    if a.json:
        with open(a.json, "w") as f:
            json.dump({"mesh": [dm, rm], "batch": a.batch, "res": a.res,
                       "depth": a.depth, "traffic": traffic,
                       "param_bytes": param_bytes}, f, indent=2)
        print(f"-> {a.json}")


if __name__ == "__main__":
    main()
