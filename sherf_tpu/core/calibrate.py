"""Scene-adaptive sizing of the renderer's static capacity budgets.

The reference sizes every pruning stage dynamically with boolean indexing
(renderer.py:315-321): the survivor tensors are exactly as large as the
scene demands, frame by frame.  XLA needs static shapes, so the TPU
renderer compacts into fixed budgets (``RenderConfig.point_capacity_frac``
etc.) — and a loose budget silently pays for sample slots the scene never
fills (the last ~35% of the exact-survivor budget was dead work at the
default fractions).

``calibrate_budgets`` measures the actual survivor counts of one or more
representative batches on device and returns a RenderConfig whose budgets
cover the worst observed frame times a safety margin, rounded up for
compile-cache friendliness.  The renderer re-validates at run time in the
same way bench.py asserts: an overflowing budget truncates body samples,
so calibrate with representative (worst-case pose/view) batches.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable

import numpy as np

import jax
import jax.numpy as jnp


def _round_up(n: int, mult: int) -> int:
    return int(math.ceil(n / mult) * mult)


def measure_sparse_sites(t_vertices, voxel_size: float, pad: float = 0.05):
    """Exact occupied-site counts of the sparse-conv volume at each
    downsampled scale (the site sets SparseConv3d(kernel 3, stride 2,
    pad 1) produces — spconv's rulebook, renderer.py:862-871).

    The counts are deterministic per canonical body (t_vertices is the
    big-pose SMPL output), so this runs host-side in NumPy.  Returns a list
    of 3 ints: sites after down0 / down1 / down2.
    """
    from sherf_tpu.features.sparseconv import prepare_voxel_volume

    t_vertices = np.asarray(t_vertices)
    min_dhw, out_sh = prepare_voxel_volume(t_vertices, pad=pad,
                                           voxel_size=voxel_size)
    dhw = t_vertices[:, [2, 1, 0]]
    coords = np.asarray(jnp.round(jnp.asarray(
        (dhw - min_dhw) / voxel_size))).astype(np.int64)
    occ = np.zeros(out_sh, bool)
    occ[coords[:, 0], coords[:, 1], coords[:, 2]] = True
    counts = []
    for _ in range(3):
        so = tuple((s - 1) // 2 + 1 for s in occ.shape)
        padded = np.pad(occ, 1)
        nxt = np.zeros(so, bool)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    nxt |= padded[dz:dz + 2 * so[0]:2,
                                  dy:dy + 2 * so[1]:2,
                                  dx:dx + 2 * so[2]:2]
        occ = nxt
        counts.append(int(occ.sum()))
    return counts


def calibrate_sparse_caps(t_vertices_list, voxel_size: float,
                          margin: float = 1.1, round_to: int = 256,
                          pad: float = 0.05):
    """Fit ``ModelConfig.sparse_caps`` to the true per-scale site counts.

    An undersized cap silently TRUNCATES the site list in
    ``downsample_sites`` (zeroing real body features near the dropped
    sites), and an oversized one pays 27-neighbor gathers for empty rows,
    so both directions matter.  ``t_vertices_list``: canonical vertices of
    every subject the model will serve (counts are static per subject).
    """
    worst = [0, 0, 0]
    for tv in t_vertices_list:
        counts = measure_sparse_sites(tv, voxel_size, pad=pad)
        worst = [max(w, c) for w, c in zip(worst, counts)]
    return tuple(_round_up(int(c * margin), round_to) for c in worst)


def measure_budgets(batch, cfg) -> dict:
    """Survivor counts for one batch at the production prune settings.

    Returns {"rays": .., "voxel": .., "exact": .., "step_max": ..,
    "span": ..} (ints / floats, host-side).
    """
    from sherf_tpu.kernels.knn import nn_1
    from sherf_tpu.kernels.knn_pallas import ray_body_mask_pallas
    from sherf_tpu.kernels.occupancy import strided_occupancy

    rcfg = cfg.render
    H_W = batch.ray_o.shape[1]
    D = rcfg.depth_resolution
    steps = jnp.linspace(0.0, 1.0, D)
    out = {"rays": 0, "voxel": 0, "exact": 0, "step_max": 0.0, "span": 0.0}
    for b in range(batch.ray_o.shape[0]):
        dvals = batch.near[b][:, None] + (batch.far[b]
                                          - batch.near[b])[:, None] * steps
        pts = (batch.ray_o[b][:, None]
               + dvals[..., None] * batch.ray_d[b][:, None]).reshape(-1, 3)
        # mirrors the renderer: coarse depth grids (D < 24) test every
        # sample — the stride's dilation margin cannot cover their steps
        stride = rcfg.prune_stride if D >= 24 else 1
        occ_n = int(jax.jit(lambda p, v: strided_occupancy(
            p.reshape(-1, D, 3), v, stride=stride,
            step_margin=rcfg.prune_step_margin).sum())(
                pts, batch.vertices[b]))
        # exact count estimated on a 1/s depth subsample (xs), same as the
        # bench validation; the margin covers the estimator error.  The
        # stride must not divide into whole rays: the flattened points are
        # ray-major/depth-minor, so at D=8 a stride of 8 sampled ONLY
        # depth 0 of every ray and estimated exact ~0 — the fitted budget
        # then truncated every real sample (r5 lifecycle smoke)
        s = 8 if D >= 24 else max(1, D // 4)
        d2 = jax.jit(lambda q, v: nn_1(q, v)[0])(pts[::s], batch.vertices[b])
        exact_n = int((d2 < rcfg.prune_threshold_sq).sum()) * s
        # ray budget mirrors the renderer's combined mask: AABB hit AND the
        # segment-level body-proximity test (renderer ray compaction)
        thr_ray = (float(np.sqrt(rcfg.prune_threshold_sq)) + 1e-3) ** 2
        seg = jax.jit(lambda o, d, nr, fr, v: ray_body_mask_pallas(
            o, d, nr, fr, v, thr_ray))(
            batch.ray_o[b], batch.ray_d[b], batch.near[b], batch.far[b],
            batch.vertices[b])
        hit = int((np.asarray(batch.mask_at_box[b]).astype(bool)
                   & np.asarray(seg)).sum())
        out["rays"] = max(out["rays"], hit)
        out["voxel"] = max(out["voxel"], occ_n)
        out["exact"] = max(out["exact"], exact_n)
        out["step_max"] = max(out["step_max"], float(jnp.max(
            (batch.far[b] - batch.near[b]) / (D - 1))))
        out["span"] = max(out["span"], float(jnp.max(
            jnp.max(batch.vertices[b], 0) - jnp.min(batch.vertices[b], 0))))
    return out


def calibrate_budgets(batches: Iterable, cfg, margin: float = 1.2,
                      round_to: int = 8192):
    """Returns (RenderConfig with fitted budgets, measured dict).

    ``batches``: representative SHERFBatch instances (worst-case poses and
    views); ``margin``: multiplicative headroom over the worst observation.

    CONTRACT (advisor r4): the fitted budgets — including the fitted
    ``prune_step_margin`` — are guarantees only for frames shaped like the
    calibration batches.  Every consumer of a calibrated config MUST read
    the renderer's 'diag' collection (``model.apply(..., mutable=["diag"])``
    + ``core.diag.overflow_report``) and treat ANY nonzero counter —
    including ``step_overflow`` — as a corrupted frame: recalibrate with
    batches covering that pose/view or a larger ``margin``.  bench.py,
    cli/eval.py and the training tools all do this; a new tool that skips
    the check silently renders truncated bodies.
    """
    from sherf_tpu.kernels.occupancy import CELL, GRID_SIZE

    rcfg = cfg.render
    batches = list(batches)
    assert batches, "need at least one calibration batch"
    D = rcfg.depth_resolution
    # fit the stride dilation margin to the scene's true max per-ray depth
    # step (snapped up to 5mm for compile-cache stability): the margin only
    # has to cover samples the stride SKIPS (one step away from a tested
    # one), and every extra cm of margin widens the conservative ball the
    # exact-KNN stage then has to re-test.  The renderer sows a
    # step_overflow diag if a production frame ever exceeds the fitted
    # margin (same contract as the capacity budgets: calibrate on
    # worst-case batches, watch the counters).
    if rcfg.prune_stride > 1 and D >= 24:
        step_max = max(float(jnp.max((b.far - b.near) / (D - 1)))
                       for b in batches)
        fitted_margin = math.ceil(step_max / 0.005) * 0.005
        cfg = dataclasses.replace(
            cfg, render=dataclasses.replace(rcfg,
                                            prune_step_margin=fitted_margin))
        rcfg = cfg.render

    worst = {"rays": 0, "voxel": 0, "exact": 0, "step_max": 0.0, "span": 0.0}
    H_W = None
    for batch in batches:
        m = measure_budgets(batch, cfg)
        H_W = batch.ray_o.shape[1]
        for k in ("rays", "voxel", "exact"):
            worst[k] = max(worst[k], m[k])
        worst["step_max"] = max(worst["step_max"], m["step_max"])
        worst["span"] = max(worst["span"], m["span"])
    # the grid must fit the body plus the dilated ball on BOTH sides (the
    # grid origin already sits radius + 2 cells below the vertex min,
    # occupancy.py) — the old flat 0.5m slack spuriously rejected tall
    # wide-pose subjects (r4: a 2.06m synthetic body)
    radius = float(np.sqrt(rcfg.prune_threshold_sq))
    eff_margin = (rcfg.prune_step_margin
                  if rcfg.prune_stride > 1 and D >= 24 else 0.0)
    need = worst["span"] + 2 * (radius + eff_margin + 3 * CELL)
    assert need < GRID_SIZE * CELL, \
        (f"body span {worst['span']:.2f}m + dilation needs {need:.2f}m > "
         f"occupancy grid {GRID_SIZE * CELL:.2f}m")
    # validate the fitted margin against the EDT grid's int16 headroom NOW,
    # with an actionable error, instead of an opaque trace-time assert in
    # distance_grid (advisor r4): scenes with long near-far spans at low D
    # can fit a margin whose dilated ball needs a wider window than the
    # int16 sentinel supports
    from sherf_tpu.kernels.occupancy import INT16_W2_MAX, edt_window_cells

    w = edt_window_cells(radius + eff_margin)
    if w * w > INT16_W2_MAX:
        raise ValueError(
            f"fitted prune_step_margin {eff_margin:.3f}m dilates the prune "
            f"ball to {radius + eff_margin:.3f}m, needing EDT window w={w} "
            f"(w*w={w * w} > int16 headroom {INT16_W2_MAX}).  Raise "
            f"depth_resolution (shrinks per-ray steps and the fitted "
            f"margin) or set prune_stride=1 (drops the margin from the "
            f"ball).")

    M = H_W * D
    caps = {k: min(_round_up(int(worst[k] * margin), round_to), total)
            for k, total in (("rays", H_W), ("voxel", M), ("exact", M))}
    fitted = dataclasses.replace(
        rcfg,
        ray_capacity_frac=caps["rays"] / H_W,
        point_capacity_frac=caps["voxel"] / M,
        exact_capacity_frac=caps["exact"] / M,
    )
    if rcfg.depth_resolution_importance > 0:
        # The fine pass samples PDF-concentrated depths INSIDE occupied
        # space, so the uniform grid's occupancy-survivor fraction
        # (point_capacity_frac, the old default) undersizes it.  Size it
        # so the budget covers EVERY fine sample of every budgeted ray
        # (cap = rays_cap * Di): the occupancy prune only removes samples,
        # so this bound cannot overflow.
        fitted = dataclasses.replace(
            fitted, importance_capacity_frac=caps["rays"] / H_W)
    return fitted, worst
