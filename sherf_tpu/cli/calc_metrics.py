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
    p.add_argument("--metrics", nargs="*", default=["fid", "kid"],
                   help="any of: fid kid pr ppl is eqt eqr (reference "
                        "metric_main.py registry: fid50k_full, kid50k_full, "
                        "pr50k3_full, ppl2_wend, is50k, eqt50k_int, eqr50k)")
    p.add_argument("--ppl_epsilon", type=float, default=1e-4)
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
    model, _, cfg = build_model(cfg, smpl)

    # render + collect features
    from sherf_tpu.data import make_synthetic_batch

    variables = None
    reals, fakes = FeatureStats(capture_all=True), FeatureStats(capture_all=True)
    fake_images = []  # [0,1] renders retained for the IS classifier pass
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
        if "is" in a.metrics:
            fake_images.append(fake)

    results = {}
    if "fid" in a.metrics:
        results["fid"] = frechet_distance(*reals.get_mean_cov(),
                                          *fakes.get_mean_cov())
    if "kid" in a.metrics:
        results["kid"] = kernel_distance(reals.get_all(), fakes.get_all())
    if "pr" in a.metrics:
        pr = precision_recall(reals.get_all(), fakes.get_all())
        results["precision"], results["recall"] = pr
    if "is" in a.metrics:
        # IS: reference-defined over Inception softmax when weights exist
        # (inception_score.py:21-26); else over the pluggable extractor's
        # softmax as a stand-in
        from sherf_tpu.eval.gan_metrics import inception_score
        from sherf_tpu.features.inception import inception_extractor

        cls = inception_extractor(logits=True)
        if cls is not None and fake_images:
            probs = np.concatenate([cls(np.asarray(f)) for f in fake_images],
                                   axis=0)
            mean, std = inception_score(probs)
        else:
            logits = fakes.get_all()
            e = np.exp(logits - logits.max(1, keepdims=True))
            mean, std = inception_score(e / e.sum(1, keepdims=True))
        results["is_mean"], results["is_std"] = mean, std
    if "ppl" in a.metrics:
        results["ppl"] = _ppl(model, variables, smpl, a, fwd_raw=None)
    if "eqt" in a.metrics or "eqr" in a.metrics:
        eq = _equivariance(model, variables, smpl, a)
        if "eqt" in a.metrics:
            results["eqt_int_psnr"] = eq["eqt"]
        if "eqr" in a.metrics:
            results["eqr90_psnr"] = eq["eqr"]
    print(json.dumps(results))
    with open(a.out, "w") as f:
        json.dump(results, f)


def _ppl(model, variables, smpl, a, fwd_raw=None):
    """PPL in w space with end sampling (reference ppl2_wend,
    perceptual_path_length.py): perturb the mapped latent by epsilon along
    the slerp toward a second observation's latent, re-synthesize on the
    SAME target geometry, and aggregate LPIPS/eps^2."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.eval.gan_metrics import perceptual_path_length
    from sherf_tpu.train.lpips import LPIPS, lpips_params

    lp = lpips_params()
    if lp is None:
        return float("nan")
    lpips = LPIPS()
    dist_fn = jax.jit(lambda x, y: lpips.apply({"params": lp}, x, y))

    mapping = jax.jit(lambda v, img: model.apply(v, img,
                                                 method=model.mapping))
    synth = jax.jit(lambda v, w, b: model.apply(
        v, w, b, smpl, method=model.synthesis)["image_raw"])

    eps = a.ppl_epsilon
    dists = []
    for i in range(min(a.num_items, 16)):
        b0 = make_synthetic_batch(smpl, batch_size=1, H=a.size, W=a.size,
                                  seed=2 * i)
        b1 = make_synthetic_batch(smpl, batch_size=1, H=a.size, W=a.size,
                                  seed=2 * i + 1)
        w0 = mapping(variables, b0.obs_img)
        w1 = mapping(variables, b1.obs_img)
        wt1 = w0 + (w1 - w0) * eps          # lerp in w (ppl2_wend: space='w')
        img0 = synth(variables, w0, b0)
        img1 = synth(variables, wt1, b0)
        dists.append(float(np.asarray(dist_fn(img0, img1))[0]))
    return perceptual_path_length(np.asarray(dists), epsilon=eps)


def _equivariance(model, variables, smpl, a):
    """Integer-translation / 90-degree-rotation equivariance of the renderer
    (reference eqt50k_int / eqr50k, metrics/equivariance.py, adapted to
    SHERF's explicit per-pixel rays: transforming the ray grid must
    transform the render identically — exact for integer shifts and
    90-degree rotations, so no antialiasing filters are needed)."""
    import dataclasses
    import numpy as np
    import jax

    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.eval.gan_metrics import equivariance_psnr

    H = W = a.size
    fwd = jax.jit(lambda v, b: model.apply(v, b, smpl)["image_raw"])

    def grids(batch):
        return {f: np.asarray(getattr(batch, f)).reshape(
            (1, H, W) + np.asarray(getattr(batch, f)).shape[2:])
            for f in ("ray_o", "ray_d", "near", "far")}

    eqt_vals, eqr_vals = [], []
    for i in range(min(a.num_items, 8)):
        batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=i)
        base = np.asarray(fwd(variables, batch)[0]).reshape(H, W, 3)
        g = grids(batch)

        # EQ-T: shift the ray grid by (dy, dx) integer pixels
        dy, dx = H // 8, W // 8
        shifted = {k: np.roll(v, (dy, dx), axis=(1, 2)) for k, v in g.items()}
        b2 = dataclasses.replace(
            batch, **{k: v.reshape(np.asarray(getattr(batch, k)).shape)
                      for k, v in shifted.items()})
        out = np.asarray(fwd(variables, b2)[0]).reshape(H, W, 3)
        ref = np.roll(base, (dy, dx), axis=(0, 1))
        mask = np.zeros((H, W, 3), bool)
        mask[dy:, dx:] = True                   # exclude wrapped region
        eqt_vals.append(equivariance_psnr(out, ref, mask))

        # EQ-R: rotate the ray grid by 90 degrees
        rot = {k: np.rot90(v, 1, axes=(1, 2)).copy() for k, v in g.items()}
        b3 = dataclasses.replace(
            batch, **{k: v.reshape(np.asarray(getattr(batch, k)).shape)
                      for k, v in rot.items()})
        out = np.asarray(fwd(variables, b3)[0]).reshape(H, W, 3)
        eqr_vals.append(equivariance_psnr(out, np.rot90(base, 1,
                                                        axes=(0, 1))))
    return {"eqt": float(np.mean(eqt_vals)), "eqr": float(np.mean(eqr_vals))}


if __name__ == "__main__":
    main()
