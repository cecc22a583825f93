"""Evaluate a trained model: novel-view + novel-pose protocols with
PSNR/SSIM/LPIPS (reference eval_*.sh -> train.py --test_flag True ->
test_loop.test)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True,
                   choices=["renderpeople", "thuman", "humman", "zju",
                            "synthetic_grid"])
    p.add_argument("--data", required=True,
                   help="a subject dir; siblings + human_list.txt define the "
                   "split (synthetic_grid: 'subject<id>', no files needed)")
    p.add_argument("--resume", required=True, help="checkpoint path")
    p.add_argument("--outdir", default="eval_out")
    p.add_argument("--subjects", nargs="*", default=None,
                   help="override eval subject dirs")
    p.add_argument("--use_ema", type=lambda s: s.lower() == "true", default=True)
    p.add_argument("--obs_pose_mode", choices=["reference", "first"],
                   default="reference",
                   help="novel-pose observation indexing: 'reference' "
                   "replicates test_loop.py:267's re-based obs_pose_index "
                   "quirk for metric parity; 'first' pins the observation "
                   "to the np_pose_start pose itself")
    from sherf_tpu.cli.common import add_model_flags
    add_model_flags(p)
    a = p.parse_args(argv)

    import jax

    from sherf_tpu.cli.common import build_model, model_config_from_args, resolve_smpl
    from sherf_tpu.core.config import EVAL_DEFAULTS, EVAL_SUBJECTS, TrainConfig
    from sherf_tpu.data import DATASETS
    from sherf_tpu.eval.test_loop import run_eval
    from sherf_tpu.train.checkpoint import restore_checkpoint
    from sherf_tpu.train.train_state import create_train_state

    cfg = model_config_from_args(a)
    smpl = resolve_smpl(a.smpl_model)
    model, out_sh, cfg = build_model(cfg, smpl)

    # eval subjects (test_loop.py:102-151); fall back to explicit list
    humans_root = os.path.dirname(a.data)
    if a.subjects:
        subjects = a.subjects
    else:
        ranges = {"renderpeople": (450, 480), "thuman": (90, 100)}
        if a.cfg in ranges:
            lo, hi = ranges[a.cfg]
            with open(os.path.join(humans_root, "human_list.txt")) as f:
                subjects = [os.path.join(humans_root, x.strip())
                            for x in f.readlines()[lo:hi]]
        else:
            # hardcoded reference lists (test_loop.py:112-151): 22 HuMMan
            # subjects, 3 ZJU CoreView subjects
            subjects = [os.path.join(humans_root, n) for n in EVAL_SUBJECTS[a.cfg]]

    proto = EVAL_DEFAULTS[a.cfg]
    scaling = (1 / 3 if a.cfg == "humman"
               else a.neural_rendering_resolution_initial /
               (1024 if a.cfg == "zju" else 512))

    def make_dataset(root, poses_start, poses_interval, poses_num):
        return DATASETS[a.cfg](root, smpl, split="test", multi_person=False,
                               num_instance=1, poses_start=poses_start,
                               poses_interval=poses_interval, poses_num=poses_num,
                               image_scaling=scaling, white_back=a.white_back,
                               sample_obs_view=False, fix_obs_view=True)

    # restore params
    probe = make_dataset(a.data, proto["nv_pose_start"], proto["pose_interval"], 1)
    from sherf_tpu.data.base import collate

    example = collate([probe[0]])
    if a.calibrate_budgets:
        from sherf_tpu.cli.common import calibrated_config

        # calibrate over a POSE/VIEW SWEEP of each eval subject, not one
        # frame (VERDICT r1: budgets fitted to a single body truncate
        # harder poses) — every pose in the protocol range, across the
        # RENDERED view grid (r5: obs-view-only sweeps missed the target
        # views' survivor counts and overflowed at eval time)
        sweep = []
        for root in subjects:
            ds = make_dataset(root, proto["np_pose_start"],
                              proto["pose_interval"], proto["pose_num"])
            vstride = max(2, ds.camera_view_num // 6)
            for p in range(proto["pose_num"]):
                for v in range(0, ds.camera_view_num, vstride):
                    idx = p * ds.camera_view_num + int(v)
                    if idx < len(ds):
                        sweep.append(collate([ds[idx]]))
        cfg = calibrated_config(cfg, sweep or [example],
                                margin=a.calibrate_margin)
        model, out_sh, cfg = build_model(cfg, smpl)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(example)
    params = dict(variables).pop("params")
    extra = {k: v for k, v in variables.items() if k != "params"}
    state = create_train_state(params, extra, TrainConfig())
    state = restore_checkpoint(a.resume, state)
    use_params = state.ema_params if a.use_ema else state.params

    from sherf_tpu.core.diag import overflow_report

    raw_fwd = jax.jit(lambda b: model.apply(
        {"params": use_params, **state.extra_vars}, b, smpl,
        mutable=["diag"]))

    def fwd(b):
        out, mvars = raw_fwd(b)
        # fail loud if a static budget truncated real body samples: a
        # silently corrupted render would poison the metric tables
        overflow = overflow_report(jax.device_get(mvars.get("diag", {})))
        if any(v > 0 for v in overflow.values()):
            raise RuntimeError(
                f"capacity budget overflow during eval: {overflow}; "
                "re-run with --calibrate_budgets/--calibrate_margin or "
                "larger capacity fracs")
        return out

    results = run_eval(
        fwd, make_dataset, subjects, list(proto["obs_views"]), a.outdir,
        nv_pose_start=proto["nv_pose_start"], np_pose_start=proto["np_pose_start"],
        pose_interval=proto["pose_interval"], pose_num=proto["pose_num"],
        data_interval=1 if a.cfg == "humman" else 2,
        obs_pose_mode=a.obs_pose_mode)
    print(results)


if __name__ == "__main__":
    main()
