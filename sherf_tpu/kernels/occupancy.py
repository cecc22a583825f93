"""Conservative body-proximity prune via a bounded Euclidean distance field.

The reference prunes ray samples by an exact KNN against all 6,890 SMPL
vertices (renderer.py:315-321) — at 512x512x48 that is 12.6M x 6890
distance evaluations and dominates the frame (measured 1.25s of a 2.5s
frame on v5e).  The prune only needs a yes/no "within ~5cm of the body";
this module answers that with a voxel grid holding the squared distance to
the nearest vertex-occupied cell (exact up to the prune threshold): one
scatter of 6,890 vertices, three windowed separable min-plus passes (the
classic separable squared-EDT, truncated at the threshold window), and one
gather per sample point.

The BALL-shaped acceptance region this produces is a strict superset of
the exact test (cell-center quantization adds at most sqrt(3)*cell of
slack per endpoint pair) but far tighter than the earlier separable BOX
dilation, whose corners over-reached the prune radius by ~sqrt(3)x: on the
production 512x512x48 frame the box admitted ~648k of 1.18M candidate
samples into the exact-KNN stage where the EDT ball admits substantially
fewer — and every admitted sample pays compaction + KNN + gather cost
downstream.  The renderer re-applies the exact distance test on the
compacted points, keeping results identical to the reference semantics.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from jax import lax

GRID_SIZE = 224          # static cells per axis
CELL = 0.0125            # meters; 224 * 0.0125 = 2.8 m cube covers any SMPL
                         # (192/2.4m rejected a wide-pose 2.14m-span
                         # synthetic subject once the prune dilation was
                         # added on both sides — r5 lifecycle artifact;
                         # 224^3 int16 = 22 MB, still trivial HBM)
#                          pose (max body span ~2.2 m arms-out) with the
#                          dilation margin; bench.py validates the span.
#                          Smaller grid (7 MB int8 vs 11 MB at 224) gathers
#                          measurably faster in-frame.
# unreachable-cell sentinel (window-truncated); int16 halves the EDT
# build's HBM traffic (~40-70 shifted passes over the 7M-cell grid);
# 30000 + the largest window offset^2 (<= INT16_W2_MAX) stays below
# int16 max.  INT16_W2_MAX bounds the supported (radius + step_margin):
# calibrate_budgets validates the fitted margin against it up front.
INT16_W2_MAX = 300
_INF = jnp.int16(30000)


def edt_window_cells(radius: float, cell: float = CELL) -> int:
    """EDT window half-width (in cells) the ball test needs for ``radius``
    — the value distance_grid's int16 headroom assert is checked against."""
    return int(math.ceil(math.sqrt(_ball_threshold_cells_sq(radius, cell))))


def _shift_axis(x: jnp.ndarray, off: int, axis: int) -> jnp.ndarray:
    """x shifted by `off` along `axis`, vacated cells filled with _INF
    (jnp.roll would wrap occupied cells across the body AABB)."""
    if off == 0:
        return x
    pad = [(0, 0)] * x.ndim
    idx = [slice(None)] * x.ndim
    n = x.shape[axis]
    if off > 0:
        pad[axis] = (off, 0)
        idx[axis] = slice(0, n)
    else:
        pad[axis] = (0, -off)
        idx[axis] = slice(-off, n - off)
    return lax.pad(x, _INF, [(p[0], p[1], 0) for p in pad])[tuple(idx)]


def distance_grid(verts: jnp.ndarray, lo: jnp.ndarray, w: int,
                  cell: float = CELL, grid_size: int = GRID_SIZE):
    """(G, G, G) int16 grid: squared distance IN CELL UNITS from each cell
    to the nearest vertex-containing cell, exact for values <= w*w (larger
    values may read as _INF-ish — callers threshold below w*w).

    Separable squared EDT: pass k replaces d2 with
    min_off (d2_shifted(off) + off^2) over off in [-w, w] along axis k;
    after the three passes d2[c] = min over seed cells s of |c - s|^2
    whenever that minimum is <= w^2 (window truncation only affects
    farther cells).
    """
    assert w * w <= INT16_W2_MAX, (
        f"EDT window w={w} (w*w={w * w}) exceeds the int16 sentinel "
        f"headroom {INT16_W2_MAX}: the prune radius + step margin is too "
        f"large for this grid — raise depth_resolution (shrinks per-ray "
        f"steps and the fitted margin), set prune_stride=1 (drops the "
        f"margin from the ball), or widen the EDT grid to int32")
    G = grid_size
    vidx = jnp.floor((verts - lo) / cell).astype(jnp.int32)
    ok = jnp.all((vidx >= 0) & (vidx < G), axis=-1)
    flat = (vidx[:, 0] * G + vidx[:, 1]) * G + vidx[:, 2]
    flat = jnp.where(ok, flat, G * G * G)
    d2 = jnp.full((G * G * G,), _INF, jnp.int16).at[flat].set(
        0, mode="drop").reshape(G, G, G)
    for axis in range(3):
        best = d2 + 0
        for off in range(1, w + 1):
            o2 = jnp.int16(off * off)
            best = jnp.minimum(best, _shift_axis(d2, off, axis) + o2)
            best = jnp.minimum(best, _shift_axis(d2, -off, axis) + o2)
        d2 = best
    return d2


def _ball_threshold_cells_sq(radius: float, cell: float) -> int:
    """Largest int T2 such that accepting cells with d2_cells <= T2 is a
    strict superset of the exact `within radius` test: the vertex sits
    anywhere in its seed cell and the query anywhere in its cell, so the
    true distance is at least (center distance) - sqrt(3)*cell."""
    t = radius / cell + math.sqrt(3.0)
    return int(math.floor(t * t + 1e-9))


def strided_occupancy(pts: jnp.ndarray, verts: jnp.ndarray,
                      radius: float = 0.05, stride: int = 3,
                      step_margin: float = 0.06, cell: float = CELL,
                      grid_size: int = GRID_SIZE) -> jnp.ndarray:
    """Conservative occupancy over a (N, D, 3) ray-sample grid, querying
    only every ``stride``-th depth sample.

    The voxel gather is per-row-cost-bound (~8ns/sample in-frame), so
    testing a 1/stride subset and spreading flags to +-1 neighbors cuts its
    cost by ~stride.  Correctness: every sample is within one index of a
    tested sample (guaranteed by construction for stride <= 3, statically
    asserted) and hence within ``step_margin`` meters of it along the ray
    (calibrate_budgets fits step_margin to the scene's measured max step;
    the renderer sows a step_overflow diag when a frame exceeds it), and
    the ball test is inflated by ``step_margin`` — so a sample within
    ``radius`` of a vertex always has an accepted tested neighbor: a
    strict superset of the exact test, exactly like the unstrided mask.

    Returns (N * D,) bool.
    """
    N, D, _ = pts.shape
    if stride <= 1:
        return occupancy_mask(pts.reshape(-1, 3), verts, radius=radius,
                              cell=cell, grid_size=grid_size)
    ks = sorted(set(list(range(0, D, stride)) + [D - 1]))
    # static coverage check: every sample has a tested index within 1
    nbr = []
    for k in range(D):
        cands = [i for i, kp in enumerate(ks) if abs(kp - k) <= 1]
        assert cands, f"stride {stride} leaves sample {k} uncovered"
        nbr.append((cands[0], cands[-1]))
    lo = np.asarray([a for a, _ in nbr])
    hi = np.asarray([b for _, b in nbr])

    occ_t = occupancy_mask(pts[:, np.asarray(ks)].reshape(-1, 3), verts,
                           radius=radius + step_margin, cell=cell,
                           grid_size=grid_size).reshape(N, len(ks))
    occ_full = occ_t[:, lo] | occ_t[:, hi]
    return occ_full.reshape(N * D)


def occupancy_mask(query: jnp.ndarray, verts: jnp.ndarray,
                   radius: float = 0.05, cell: float = CELL,
                   grid_size: int = GRID_SIZE) -> jnp.ndarray:
    """query: (N, 3); verts: (V, 3) in the same frame.  Returns (N,) bool —
    True whenever the query MIGHT be within ``radius`` of a vertex
    (ball-shaped conservative superset via the truncated EDT)."""
    lo = jnp.min(verts, axis=0) - (radius + 2 * cell)
    G = grid_size
    t2 = _ball_threshold_cells_sq(radius, cell)
    w = int(math.ceil(math.sqrt(t2)))
    occ = (distance_grid(verts, lo, w, cell=cell, grid_size=grid_size)
           <= t2).astype(jnp.int8)

    qidx = jnp.floor((query - lo) / cell).astype(jnp.int32)
    inb = jnp.all((qidx >= 0) & (qidx < G), axis=-1)
    qflat = jnp.clip((qidx[:, 0] * G + qidx[:, 1]) * G + qidx[:, 2],
                     0, G * G * G - 1)
    return (occ.reshape(-1)[qflat] > 0) & inb
