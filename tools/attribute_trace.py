"""Join the latest /tmp/jaxtrace with a fresh HLO dump of the production
frame, attributing device time to source file:line.

Run AFTER tools/trace_frame.py (reuses its trace; recompiles the same
graph to read fusion metadata — cached, so fast).
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
    cfg = ModelConfig(compute_dtype="bfloat16", render=RenderConfig(
        depth_resolution=D, point_capacity_frac=1 / 24,
        ray_capacity_frac=0.375, exact_capacity_frac=1 / 48,
        density_noise=0.0))
    model = SHERFGenerator(cfg, out_sh=out_sh)
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=0)
    scfg = ModelConfig(compute_dtype="bfloat16",
                       render=RenderConfig(depth_resolution=4,
                                           density_noise=0.0))
    small = SHERFGenerator(scfg, out_sh=out_sh)
    tiny = make_synthetic_batch(smpl, batch_size=1, H=8, W=8, seed=0)
    variables = jax.jit(lambda b: small.init(jax.random.PRNGKey(0), b,
                                             smpl))(tiny)
    fwd = jax.jit(lambda v, b: model.apply(v, b, smpl)["image_raw"])
    txt = fwd.lower(variables, batch).compile().as_text()
    print("HLO chars:", len(txt), file=sys.stderr)

    # op name -> (source, op_name-kind) from HLO metadata
    meta = {}
    for m in re.finditer(
            r'%([\w.\-]+) = [^\n]*?metadata=\{op_name="([^"]*)"'
            r'(?:[^}]*?source_file="([^"]*)")?'
            r'(?:[^}]*?source_line=(\d+))?', txt):
        name, op_name, src, line = m.groups()
        key = name
        if key not in meta:
            tag = (f"{src.split('/')[-1]}:{line}" if src else "")
            meta[key] = (tag, op_name.split("/")[-1],
                         "/".join(op_name.split("/")[2:5]))

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
    n_by_src = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and e["pid"] == tpu_pid
                and e["tid"] in op_tids):
            name = e.get("name", "")
            tag, kind, stack = meta.get(name, ("", "", ""))
            key = f"{tag:36s} {kind[:24]:24s} {stack[:40]}" if tag or kind \
                else f"<unattributed: {name[:40]}>"
            by_src[key] += e.get("dur", 0)
            n_by_src[key] += 1
    total = sum(by_src.values()) / 1000 / iters
    print(f"device total: {total:.1f} ms/frame")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v / 1000 / iters:8.2f} ms x{n_by_src[k] // iters:<4d} {k}")


if __name__ == "__main__":
    main()
