"""Compute-only body-proximity prune via per-bone capsules.

Replaces the dilated occupancy-grid prune (occupancy.py) on the hot path.
The voxel approach costs one random gather per sample — ~10ns/sample on TPU
(measured 135ms for 12.6M samples on v5e, the single largest line in the
frame profile).  This version answers the same conservative "might be within
r of a SMPL vertex?" question with pure VPU arithmetic and ZERO gathers:

  * each of the 24 bones is a capsule around its posed joint->parent segment;
  * every vertex is assigned to its argmax-blend-weight bone (per frame,
    from the live posed vertices), and the capsule radius is
    max_{assigned v} dist(v, segment) + r  — so  dist(x, any vertex) <= r
    implies x is inside the capsule of that vertex's bone.  The mask is a
    STRICT SUPERSET of the exact prune by construction, for any pose, with
    no tuning constants; the renderer re-applies the exact vertex-distance
    test on the compacted survivors (reference semantics, renderer.py:315).

Cost: N x 24 point-segment distances ~ 500 flops/sample on the VPU — about
6 GFLOP for a 512x512x48 frame, ~2ms.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sherf_tpu.smpl.model import SMPLModel, N_JOINTS


def _point_segment_d2(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    """Squared distance from points p (..., 3) to segment [a, b] (3,)."""
    ab = b - a
    denom = jnp.maximum(jnp.dot(ab, ab), 1e-12)
    t = jnp.clip(jnp.einsum("...c,c->...", p - a, ab) / denom, 0.0, 1.0)
    closest = a + t[..., None] * ab
    d = p - closest
    return jnp.einsum("...c,...c->...", d, d)


def capsule_radii(verts: jnp.ndarray, joints: jnp.ndarray,
                  smpl: SMPLModel, margin: float) -> jnp.ndarray:
    """Per-bone conservative radii from the LIVE posed vertices.

    verts: (6890, 3) posed; joints: (24, 3) posed (same frame).
    Returns (24,) radii such that every vertex lies within its assigned
    bone's capsule, inflated by ``margin``.
    """
    parents = np.asarray(smpl.parents)
    assign = jnp.argmax(smpl.weights, axis=-1)          # (6890,)
    a = joints[parents[np.arange(N_JOINTS)]]            # (24, 3)
    b = joints
    av = a[assign]
    bv = b[assign]
    ab = bv - av
    denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-12)
    t = jnp.clip(jnp.sum((verts - av) * ab, -1) / denom, 0.0, 1.0)
    d = jnp.linalg.norm(verts - (av + t[:, None] * ab), axis=-1)  # (6890,)
    r = jnp.zeros((N_JOINTS,), verts.dtype).at[assign].max(d)
    # bones with no assigned verts keep radius 0 - margin < 0 => never hit
    has = jnp.zeros((N_JOINTS,), bool).at[assign].set(True)
    return jnp.where(has, r + margin, -1.0)


def capsule_mask(pts: jnp.ndarray, joints: jnp.ndarray,
                 radii: jnp.ndarray, parents) -> jnp.ndarray:
    """pts: (N, 3); joints: (24, 3) posed; radii: (24,).  Returns (N,) bool —
    True when the point is inside ANY bone capsule (conservative superset of
    the exact <=margin-of-a-vertex test when radii come from
    :func:`capsule_radii`)."""
    parents = np.asarray(parents)
    hit = jnp.zeros(pts.shape[:-1], bool)
    for j in range(N_JOINTS):
        d2 = _point_segment_d2(pts, joints[parents[j]], joints[j])
        # signed square: negative radii (unassigned bones) never match
        hit = hit | (d2 <= radii[j] * jnp.abs(radii[j]))
    return hit


def prune_mask(pts: jnp.ndarray, verts: jnp.ndarray, joints: jnp.ndarray,
               smpl: SMPLModel, radius: float) -> jnp.ndarray:
    """One-call prune: conservative 'within ``radius`` of a vertex' mask.

    pts: (N, 3) query points; verts: (6890, 3) posed vertices;
    joints: (24, 3) posed joints — all in the SAME frame.
    """
    radii = capsule_radii(verts, joints, smpl, radius)
    return capsule_mask(pts, joints, radii, smpl.parents)
