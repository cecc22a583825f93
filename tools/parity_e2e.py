"""Full-size end-to-end parity vs the assembled reference.

The artifact claimed by tests/test_parity_e2e.py: pins the COMPLETE pipeline
at the production geometry — backbone 256 (reference triplane.py:59),
512x512 rays x 48 samples (train.py:349-350) — in BOTH parity mode
(point_capacity_frac=1.0) and calibrated-budget mode (the shipped static
prune budgets), against the reference TriPlaneGenerator running on CPU with
pure-torch stand-ins and shared weights.  Also loops the ablation flag
combos of the fusion dispatch (reference renderer.py:405-432).

Results are recorded in PARITY.md / BASELINE.md.

Usage:
  python tools/parity_e2e.py                         # full size, default combo
  python tools/parity_e2e.py --size small            # quick check (backbone 64)
  python tools/parity_e2e.py --combos default,osg_decoder,no_trans
  python tools/parity_e2e.py --decoder_bias partial  # low-density regime
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", choices=["full", "small"], default="full")
    p.add_argument("--combos", default="default",
                   help="comma-separated keys of parity_harness.ABLATION_COMBOS,"
                        " or 'all'")
    p.add_argument("--modes", default="parity,budgeted",
                   help="comma-separated: parity | budgeted")
    p.add_argument("--decoder_bias", choices=["saturated", "partial"],
                   default="saturated")
    p.add_argument("--margin", type=float, default=1.15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ref_cache", default=None,
                   help="directory caching the deterministic reference "
                        "forward outputs (full size: ~30min of torch CPU)")
    p.add_argument("--platform", choices=["default", "cpu"], default="default",
                   help="force our side onto CPU (the sitecustomize pins "
                        "JAX_PLATFORMS before user code, so the env var is "
                        "too late — this uses jax.config.update)")
    a = p.parse_args(argv)

    if a.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sherf_tpu.compat import parity_harness as ph
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.smpl import synthetic_smpl

    if a.size == "full":
        backbone, H, W, depth = 256, 512, 512, 48
    else:
        backbone, H, W, depth = 64, 32, 32, 8

    combos = (list(ph.ABLATION_COMBOS) if a.combos == "all"
              else a.combos.split(","))
    modes = a.modes.split(",")

    smpl = synthetic_smpl(0)
    batch = make_synthetic_batch(smpl, batch_size=1, H=H, W=W, seed=a.seed)

    results = []
    for combo in combos:
        flags = ph.ABLATION_COMBOS[combo]
        with tempfile.TemporaryDirectory() as workdir:
            t0 = time.perf_counter()
            G = ph.build_reference(smpl, workdir, flags,
                                   backbone_resolution=backbone, depth=depth,
                                   seed=a.seed, decoder_bias=a.decoder_bias)
            # the full-size torch-CPU forward takes ~30min on this box and
            # is deterministic in (combo, size, seed, bias) — cache it
            cache = (os.path.join(a.ref_cache,
                                  f"ref_{combo}_{backbone}_{H}x{W}x{depth}"
                                  f"_{a.seed}_{a.decoder_bias}.npz")
                     if a.ref_cache else None)
            if cache and os.path.exists(cache):
                import numpy as _np
                import torch

                z = _np.load(cache)
                ref = {k: torch.from_numpy(z[k]) for k in z.files}
                print(f"[{combo}] reference forward: cached ({cache})",
                      file=sys.stderr)
            else:
                ref = ph.run_reference(G, batch, H)
                if cache:
                    import numpy as _np

                    _np.savez(cache, **{k: v.numpy() for k, v in ref.items()})
            t_ref = time.perf_counter() - t0
            print(f"[{combo}] reference forward: {t_ref:.1f}s", file=sys.stderr)

            for mode in modes:
                t0 = time.perf_counter()
                model, variables, cfg = ph.build_ours(
                    G, smpl, flags, backbone_resolution=backbone, depth=depth,
                    budgeted=(mode == "budgeted"), batch=batch,
                    margin=a.margin)
                # full-size PARITY mode computes every sample: chunk rays
                # (bit-identical; see run_ours) so the all-points warp
                # intermediates fit in HBM
                chunks = 32 if (a.size == "full" and mode == "parity") else 1
                ours = ph.run_ours(model, variables, batch, smpl,
                                   ray_chunks=chunks)
                t_ours = time.perf_counter() - t0
                m = ph.compare(ref, ours, H, W)
                row = {"combo": combo, "mode": mode, "backbone": backbone,
                       "H": H, "W": W, "depth": depth,
                       "decoder_bias": a.decoder_bias, **m,
                       "ref_sec": round(t_ref, 1),
                       "ours_sec_incl_compile": round(t_ours, 1)}
                results.append(row)
                print(json.dumps(row))
                ok = m["psnr_image_raw"] > 45.0 and m["ref_fg_frac"] > 0.01
                print(f"[{combo}/{mode}] PSNR {m['psnr_image_raw']:.2f} dB "
                      f"{'OK' if ok else '** BELOW GATE **'}", file=sys.stderr)

    worst = min(r["psnr_image_raw"] for r in results)
    print(f"worst PSNR across {len(results)} runs: {worst:.2f} dB",
          file=sys.stderr)
    return results


if __name__ == "__main__":
    main()
