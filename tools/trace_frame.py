"""Capture a device trace of the production frame (bench.py's exact
config) and attribute device time to source lines.

Run: python tools/trace_frame.py  (alone; writes /tmp/jaxtrace)
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/sherf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp  # noqa: E402


def main(H=512, W=512, D=48, iters=3, top=40):
    from sherf_tpu.core.config import ModelConfig, RenderConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts)
    # must match bench.py exactly or the attribution misleads: same
    # scene-calibrated budgets (margin 1.15) as bench.main's default
    import dataclasses

    from sherf_tpu.core.calibrate import calibrate_budgets, \
        calibrate_sparse_caps

    cfg = ModelConfig(compute_dtype="bfloat16", render=RenderConfig(
        depth_resolution=D, density_noise=0.0))
    cfg = dataclasses.replace(
        cfg, sparse_caps=calibrate_sparse_caps([t_verts], cfg.voxel_size))
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=0)
    fitted, _ = calibrate_budgets([batch], cfg, margin=1.15)
    cfg = dataclasses.replace(cfg, render=fitted)
    model = SHERFGenerator(cfg, out_sh=out_sh)
    scfg = ModelConfig(compute_dtype="bfloat16",
                       render=RenderConfig(depth_resolution=4,
                                           density_noise=0.0))
    small = SHERFGenerator(scfg, out_sh=out_sh)
    tiny = make_synthetic_batch(smpl, batch_size=1, H=8, W=8, seed=0)
    variables = jax.jit(lambda b: small.init(jax.random.PRNGKey(0), b,
                                             smpl))(tiny)
    fwd = jax.jit(lambda v, b: model.apply(v, b, smpl)["image_raw"])
    out = fwd(variables, batch)
    np.asarray(out.ravel()[0])
    print("warm done", file=sys.stderr)

    os.system("rm -rf /tmp/jaxtrace")
    jax.profiler.start_trace("/tmp/jaxtrace")
    for _ in range(iters):
        out = fwd(variables, batch)
        np.asarray(out.ravel()[0])
    jax.profiler.stop_trace()

    txt = fwd.lower(variables, batch).compile().as_text()
    print("HLO chars:", len(txt), file=sys.stderr)
    meta = {}
    for mm in re.finditer(
            r'%([\w.\-]+) = [^\n]*?metadata=\{op_name="([^"]*)"'
            r'(?:[^}]*?source_file="([^"]*)")?'
            r'(?:[^}]*?source_line=(\d+))?', txt):
        name, op_name, src, line = mm.groups()
        if name not in meta:
            tag = (f"{src.split('/')[-1]}:{line}" if src else "")
            meta[name] = (tag, op_name.split("/")[-1][:20])

    paths = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pid = next(p for p, n in pids.items() if "TPU" in n)
    tids = {e["tid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e["pid"] == tpu_pid}
    op_tids = {t for t, n in tids.items() if n == "XLA Ops"}
    by_src = collections.defaultdict(float)
    n_by = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and e["pid"] == tpu_pid
                and e["tid"] in op_tids):
            tag, kind = meta.get(e.get("name", ""), ("", ""))
            key = (f"{tag:32s} {kind:20s}" if tag or kind
                   else f"<unattr: {e.get('name', '')[:36]}>")
            by_src[key] += e.get("dur", 0)
            n_by[key] += 1
    total = sum(by_src.values()) / 1000 / iters
    print(f"device total: {total:.1f} ms/frame")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v / 1000 / iters:8.2f} ms x{n_by[k] // iters:<4d} {k}")


if __name__ == "__main__":
    main()
