"""GAN metric suite over rendered vs real images (reference calc_metrics.py
+ metrics/metric_main.py, adapted to SHERF's conditioned generator: metrics
are computed over dataset items rendered from their observation images —
the EG3D z-sampling path cannot drive SHERF, SURVEY §3.4)."""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True,
                   choices=["renderpeople", "thuman", "humman", "zju", "synthetic"])
    p.add_argument("--data", default="")
    p.add_argument("--resume", default=None)
    p.add_argument("--metrics", nargs="*", default=["fid", "kid"])
    p.add_argument("--num_items", type=int, default=64)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--out", default="metrics.json")
    from sherf_tpu.cli.common import add_model_flags
    add_model_flags(p)
    a = p.parse_args(argv)

    import numpy as np
    import jax

    from sherf_tpu.cli.common import build_model, model_config_from_args, resolve_smpl
    from sherf_tpu.eval.gan_metrics import (
        FeatureStats, frechet_distance, kernel_distance, precision_recall,
        default_extractor,
    )

    extractor = default_extractor()
    if extractor is None:
        raise SystemExit(
            "calc_metrics needs a feature extractor; VGG16/LPIPS weights are "
            "not available in this environment (no egress). Convert them via "
            "sherf_tpu.train.lpips.import_lpips_torch on a machine with the "
            "lpips package and its weights.")

    smpl = resolve_smpl(a.smpl_model)
    cfg = model_config_from_args(a)
    model, _ = build_model(cfg, smpl)

    # render + collect features
    from sherf_tpu.data import make_synthetic_batch

    variables = None
    reals, fakes = FeatureStats(capture_all=True), FeatureStats(capture_all=True)
    for i in range(a.num_items):
        batch = make_synthetic_batch(smpl, batch_size=1, H=a.size, W=a.size,
                                     seed=i)
        if variables is None:
            variables = jax.jit(lambda b: model.init(
                jax.random.PRNGKey(0), b, smpl))(batch)
            fwd = jax.jit(lambda v, b: model.apply(v, b, smpl)["image_raw"])
        fake = np.asarray(fwd(variables, batch)) / 2 + 0.5
        real = np.asarray(batch.img)
        fakes.append(extractor(fake * 2 - 1))
        reals.append(extractor(real * 2 - 1))

    results = {}
    if "fid" in a.metrics:
        results["fid"] = frechet_distance(*reals.get_mean_cov(),
                                          *fakes.get_mean_cov())
    if "kid" in a.metrics:
        results["kid"] = kernel_distance(reals.get_all(), fakes.get_all())
    if "pr" in a.metrics:
        pr = precision_recall(reals.get_all(), fakes.get_all())
        results["precision"], results["recall"] = pr
    print(json.dumps(results))
    with open(a.out, "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
