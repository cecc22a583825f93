"""Conservative body-proximity prune via a dilated occupancy grid.

The reference prunes ray samples by an exact KNN against all 6,890 SMPL
vertices (renderer.py:315-321) — at 512x512x48 that is 12.6M x 6890
distance evaluations and dominates the frame (measured 1.25s of a 2.5s
frame on v5e).  The prune only needs a yes/no "within ~5cm of the body";
this module answers that with a voxel occupancy grid dilated by the prune
radius: one scatter of 6,890 vertices, three separable 1D max-dilations,
and one gather per sample point.

The dilation radius over-covers by up to one cell diagonal, so the mask is
a strict SUPERSET of the exact prune; the renderer re-applies the exact
distance test on the compacted points (where the KNN is cheap), keeping
results identical to the reference semantics.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp
from jax import lax

GRID_SIZE = 192          # static cells per axis
CELL = 0.0125            # meters; 192 * 0.0125 = 2.4 m cube covers any SMPL
#                          pose (max body span ~2.2 m arms-out) with the
#                          dilation margin; bench.py validates the span.
#                          Smaller grid (7 MB int8 vs 11 MB at 224) gathers
#                          measurably faster in-frame.


def strided_occupancy(pts: jnp.ndarray, verts: jnp.ndarray,
                      radius: float = 0.05, stride: int = 3,
                      step_margin: float = 0.06, cell: float = CELL,
                      grid_size: int = GRID_SIZE) -> jnp.ndarray:
    """Conservative occupancy over a (N, D, 3) ray-sample grid, querying
    only every ``stride``-th depth sample.

    The voxel gather is per-row-cost-bound (~8ns/sample in-frame), so
    testing a 1/stride subset and spreading flags to +-1 neighbors cuts its
    cost by ~stride.  Correctness: every tested position is within one
    depth step of any sample (guaranteed by construction for stride <= 3,
    statically asserted), and the grid dilation is inflated by
    ``step_margin`` >= the largest per-ray step (bench.py validates the
    actual step bound), so a sample within ``radius`` of a vertex always
    has a flagged tested neighbor — a strict superset of the exact test,
    exactly like the unstrided mask.

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
    True whenever the query MIGHT be within ``radius`` of a vertex."""
    lo = jnp.min(verts, axis=0) - (radius + 2 * cell)
    G = grid_size

    vidx = jnp.floor((verts - lo) / cell).astype(jnp.int32)
    ok = jnp.all((vidx >= 0) & (vidx < G), axis=-1)
    flat = (vidx[:, 0] * G + vidx[:, 1]) * G + vidx[:, 2]
    flat = jnp.where(ok, flat, G * G * G)
    occ = jnp.zeros((G * G * G,), jnp.int8).at[flat].set(1, mode="drop")
    occ = occ.reshape(G, G, G)

    # dilate by the prune radius + cell diagonal (conservative superset)
    r_cells = int(math.ceil((radius + math.sqrt(3.0) * cell) / cell))
    w = 2 * r_cells + 1
    for dims in ((w, 1, 1), (1, w, 1), (1, 1, w)):
        occ = lax.reduce_window(occ, jnp.int8(0), lax.max, dims, (1, 1, 1),
                                "SAME")

    qidx = jnp.floor((query - lo) / cell).astype(jnp.int32)
    inb = jnp.all((qidx >= 0) & (qidx < G), axis=-1)
    qflat = jnp.clip((qidx[:, 0] * G + qidx[:, 1]) * G + qidx[:, 2],
                     0, G * G * G - 1)
    return (occ.reshape(-1)[qflat] > 0) & inb
