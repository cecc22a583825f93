"""Shared end-to-end parity harness: assembled reference TriPlaneGenerator
(CPU torch, pure-torch stand-ins) vs SHERFGenerator with imported weights.

Used by tests/test_parity_e2e.py (small shapes, CI) and tools/parity_e2e.py
(full size: backbone 256, 512x512x48, parity AND calibrated-budget modes,
plus the ablation flag combos of the reference's fusion dispatch —
reference renderer.py:405-432, triplane.py:31-65,156-171).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


# Flag combos exercised against the reference.  Keys are the reference's
# constructor flags (triplane.py:35-39); "default" is the shipped production
# config of every train/eval script (use_sr_module False, SURVEY §"critical
# config fact").
ABLATION_COMBOS = {
    "default": {},
    "1d_only": dict(use_2d_feature=False, use_3d_feature=False),
    "1d_2d": dict(use_3d_feature=False),
    "1d_3d": dict(use_2d_feature=False),
    "osg_decoder": dict(use_nerf_decoder=False),
    "no_trans": dict(use_trans=False),
}


def bias_decoder_weights(G, mode: str = "saturated"):
    """Make a freshly-initialized decoder emit real structure.

    A random-init decoder composites to an (almost) empty image — a vacuous
    parity check.  'saturated' biases density far positive (alpha ~ 1 at the
    body surface); 'partial' biases it mildly so transmittance stays
    partial along the ray — the low-density regime of an early-training
    checkpoint, which exercises the marcher's cumprod blending rather than
    the first-hit-wins regime.
    """
    import torch

    sigma_bias = 4.0 if mode == "saturated" else 0.5
    sigma_gain = 3.0 if mode == "saturated" else 1.0
    with torch.no_grad():
        if hasattr(G.decoder, "alpha_linear"):  # NeRFDecoder
            G.decoder.alpha_linear.bias += sigma_bias
            G.decoder.alpha_linear.weight *= sigma_gain
            G.decoder.rgb_linear.weight *= 5.0
        else:  # OSGDecoder: sigma = out[..., 0], rgb = out[..., 1:]
            lin = G.decoder.net[2]
            # FullyConnectedLayer scales weight by 1/sqrt(fan_in) at call
            # time, so bias is the reliable lever
            lin.bias[0] += sigma_bias
            lin.weight[0] *= sigma_gain
            lin.weight[1:] *= 5.0


def build_reference(smpl, workdir: str, flags: Optional[Dict] = None,
                    backbone_resolution: int = 64, depth: int = 8,
                    seed: int = 0, decoder_bias: Optional[str] = "saturated"):
    """Construct the assembled reference generator on CPU with the given
    ablation flags, optionally biasing the decoder to render structure."""
    from sherf_tpu.compat import reference_runtime as rr

    flags = dict(flags or {})
    rk = rr.default_rendering_kwargs(depth_resolution=depth)
    G = rr.load_reference_generator(
        smpl, workdir, rendering_kwargs=rk, seed=seed,
        backbone_resolution=backbone_resolution,
        use_nerf_decoder=flags.get("use_nerf_decoder", True),
        use_trans=flags.get("use_trans", True),
        use_1d_feature=flags.get("use_1d_feature", True),
        use_2d_feature=flags.get("use_2d_feature", True),
        use_3d_feature=flags.get("use_3d_feature", True))
    if decoder_bias:
        bias_decoder_weights(G, decoder_bias)
    return G


def run_reference(G, batch, H: int):
    """Deterministic eval forward of the reference (test_flag forces
    density_noise 0, triplane.py:152-153; noise_mode='none')."""
    import torch

    from sherf_tpu.compat import reference_runtime as rr

    inp = rr.reference_input_from_batch(batch)
    with torch.no_grad():
        return G(inp, torch.randn(1, 512), torch.zeros(1, 25),
                 neural_rendering_resolution=H, use_sr_module=False,
                 test_flag=True, noise_mode="none")


def build_ours(G, smpl, flags: Optional[Dict] = None,
               backbone_resolution: int = 64, depth: int = 8,
               budgeted: bool = False, batch=None, margin: float = 1.15,
               compute_dtype: str = "float32"):
    """Import G's weights and build the SHERFGenerator counterpart.

    budgeted=False -> parity mode (point_capacity_frac=1.0: every sample
    computed, masked output).  budgeted=True -> production mode: static
    prune budgets calibrated on ``batch`` exactly as a deployment would
    size them (core/calibrate.py).
    """
    import jax.numpy as jnp

    from sherf_tpu.compat.legacy_import import import_sherf_generator
    from sherf_tpu.core.calibrate import calibrate_budgets, calibrate_sparse_caps
    from sherf_tpu.core.config import ModelConfig, RenderConfig
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import big_pose_params, smpl_forward

    flags = dict(flags or {})
    sd = {k: v for k, v in G.state_dict().items()}
    params, stats, noise, ema = import_sherf_generator(
        sd, backbone_resolution=backbone_resolution,
        use_nerf_decoder=flags.get("use_nerf_decoder", True),
        use_trans=flags.get("use_trans", True),
        use_1d_feature=flags.get("use_1d_feature", True),
        use_2d_feature=flags.get("use_2d_feature", True),
        use_3d_feature=flags.get("use_3d_feature", True))

    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    cfg = ModelConfig(
        backbone_resolution=backbone_resolution,
        compute_dtype=compute_dtype,
        sparse_caps=calibrate_sparse_caps([t_verts], 0.005),
        # coarse depth grids (small test shapes) step farther than the
        # strided voxel prune's dilation margin covers; test every sample
        render=RenderConfig(depth_resolution=depth, point_capacity_frac=1.0,
                            density_noise=0.0,
                            prune_stride=3 if depth >= 24 else 1),
        **flags)
    if budgeted:
        assert batch is not None, "budgeted mode needs a calibration batch"
        fitted, _ = calibrate_budgets([batch], cfg, margin=margin)
        cfg = dataclasses.replace(cfg, render=fitted)
    _, out_sh = prepare_voxel_volume(t_verts, voxel_size=cfg.voxel_size)
    model = SHERFGenerator(cfg, out_sh=out_sh)
    variables = {"params": params, "batch_stats": stats, "noise": noise,
                 "ema": ema}
    return model, variables, cfg


def run_ours(model, variables, batch, smpl, check_overflow: bool = True,
             ray_chunks: int = 1):
    """Forward our side.  ``ray_chunks > 1`` renders the image in ray
    blocks (one compiled program reused per block): rays are independent
    through the whole pipeline, so results are bit-identical to a single
    pass — needed for full-size PARITY mode, whose all-samples warp
    intermediates pad out to ~26 GB in one shot (the budgeted production
    path never materializes them)."""
    import jax
    import jax.numpy as jnp

    if ray_chunks <= 1:
        out, mvars = jax.jit(lambda v, b: model.apply(v, b, smpl,
                                                      mutable=["diag"]))(
            variables, batch)
    else:
        N = batch.ray_o.shape[1]
        assert N % ray_chunks == 0, (N, ray_chunks)
        ch = N // ray_chunks
        fwd = jax.jit(lambda v, b: model.apply(v, b, smpl, flat_output=True,
                                               mutable=["diag"]))
        parts, mvars, chunk_diags = [], {}, []
        for c in range(ray_chunks):
            sl = slice(c * ch, (c + 1) * ch)
            bc = batch.replace(ray_o=batch.ray_o[:, sl],
                               ray_d=batch.ray_d[:, sl],
                               near=batch.near[:, sl],
                               far=batch.far[:, sl],
                               mask_at_box=batch.mask_at_box[:, sl],
                               bkgd_msk=batch.bkgd_msk[:, sl])
            o, mvars = fwd(variables, bc)
            chunk_diags.append(jax.device_get(mvars.get("diag", {})))
            parts.append(jax.device_get(o))
        # max-accumulate the per-chunk overflow counters so truncation in
        # ANY chunk trips the assertion below (not just the final chunk's)
        mvars = {"diag": jax.tree.map(lambda *xs: np.max(np.stack(xs), 0),
                                      *chunk_diags)}
        B = batch.img.shape[0]
        H, W = batch.img.shape[1:3]
        out = {
            "image_raw": np.concatenate(
                [p["image_raw"] for p in parts], axis=1).reshape(B, H, W, 3),
            "image_depth": np.concatenate(
                [p["image_depth"] for p in parts], axis=1).reshape(B, H, W),
            "weights_image": np.concatenate(
                [p["weights_image"] for p in parts], axis=1).reshape(B, H, W),
        }
    if check_overflow:
        from sherf_tpu.core.diag import overflow_report

        overflow = overflow_report(jax.device_get(mvars.get("diag", {})))
        assert all(v == 0 for v in overflow.values()), (
            f"budget overflow corrupts the parity comparison: {overflow}")
    return jax.device_get(out) if ray_chunks <= 1 else out


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(data_range ** 2 / max(mse, 1e-12))


def compare(ref, ours, H: int, W: int) -> Dict[str, float]:
    """Metric dict for a reference-vs-ours output pair."""
    ref_img = np.transpose(ref["image_raw"].numpy(), (0, 2, 3, 1))
    our_img = np.asarray(ours["image_raw"]).reshape(ref_img.shape)
    ref_w = ref["weights_image"].numpy().reshape(1, H, W)
    our_w = np.asarray(ours["weights_image"]).reshape(1, H, W)
    ref_d = ref["image_depth"].numpy().reshape(1, H, W)
    our_d = np.asarray(ours["image_depth"]).reshape(1, H, W)
    hit = ref_w > 0.5
    return {
        "psnr_image_raw": round(psnr(ref_img, our_img), 2),
        "weights_max_diff": float(np.abs(ref_w - our_w).max()),
        "depth_max_diff_hit": (float(np.abs(ref_d[hit] - our_d[hit]).max())
                               if hit.any() else 0.0),
        "ref_fg_frac": float((ref_w > 0.5).mean()),
        "ref_img_std": float(ref["image_raw"].numpy().std()),
    }
