"""Pallas TPU kernel for nearest-SMPL-vertex queries (K=1).

Distances are built in EXACT elementwise form — per-coordinate f32
differences squared and summed on the VPU, no matmul expansion.  The
matmul form (vsq - 2 q.v + qsq) at the MXU's DEFAULT f32 precision keeps
~bf16 mantissas per pass: with |q|,|v| ~ O(m) in world coordinates the d2
error reached ~5e-2 m^2 — 20x the 2.5e-3 m^2 prune threshold (r3 find:
the on-chip exact test and the ray prune misclassified silhouette
samples; CPU oracles run in interpret mode and never saw it).  Mosaic
supports only DEFAULT and HIGHEST dot precisions; HIGHEST (6-pass f32)
measured +96ms/frame and a manual bf16x3 split +31ms — the elementwise
form needs no precision machinery at all.  Inputs are still CENTERED on
the vertex centroid in the wrappers (cheap, and keeps intermediate
magnitudes small).

The jnp formulation (knn.py) materializes (chunk, 6890) distance tiles in
HBM and re-reads them for the argmin — ~40GB of traffic for a 786k-point
query.  This kernel keeps everything on-chip: per program, a (P, 3) point
tile meets the full vertex set resident in VMEM; distances are produced a
(P, VT) tile at a time on the MXU and folded into a running (min, argmin)
over the lane axis without leaving VMEM.

Grid: one program per tile of P points.  The vertex array is padded to a
multiple of VT with far-away sentinels so padded columns never win.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile knobs (env overrides for A/B profiling)
P_TILE = int(os.environ.get("SHERF_KNN_P", "512"))    # points per program
# (1024 exceeded the 16MB scoped-vmem budget once the bf16x3 split's
# three partial-product tiles joined the d2 tile)
V_TILE = int(os.environ.get("SHERF_KNN_V", "2048"))   # vertices per inner tile
SENTINEL = 1e6     # padded-vertex coordinate


def _knn_kernel(q_ref, v_ref, dist_ref, idx_ref, *, n_vtiles: int):
    """q_ref: (P, 3); v_ref: (3, V_pad); dist_ref/idx_ref: (P, 1)."""
    q = q_ref[:]                                     # (P, 3)
    best = jnp.full((P_TILE, 1), jnp.inf, jnp.float32)
    best_i = jnp.zeros((P_TILE, 1), jnp.int32)
    for t in range(n_vtiles):
        v = v_ref[:, pl.ds(t * V_TILE, V_TILE)]      # (3, VT)
        # exact elementwise difference form: |q - v|^2 built from true
        # f32 subtractions — no cancellation of large |q|^2-ish terms, so
        # no MXU precision concerns (the matmul expansion at DEFAULT MXU
        # precision erred ~5e-2 m^2; bf16x3 splits cost ~3 extra (P, VT)
        # passes for ~the same VPU traffic as this form)
        d2 = jnp.square(q[:, 0:1] - v[0:1, :])
        d2 = d2 + jnp.square(q[:, 1:2] - v[1:2, :])
        d2 = d2 + jnp.square(q[:, 2:3] - v[2:3, :])
        m = jnp.min(d2, axis=1, keepdims=True)       # (P, 1)
        i = jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32) + t * V_TILE
        upd = m < best
        best = jnp.where(upd, m, best)
        best_i = jnp.where(upd, i, best_i)
    dist_ref[:] = best
    idx_ref[:] = best_i


# smaller point tile than the KNN kernels: the segment-distance math keeps
# ~5 (P, VT) f32 temps live (vd, vo, b, ts, dist), which at P=1024 blows
# the 16MB scoped-vmem budget (measured: 20.8M)
RSEG_P = int(os.environ.get("SHERF_RSEG_P", "256"))


def _ray_seg_kernel(r_ref, v_ref, out_ref, *, n_vtiles: int, thr: float):
    """Min squared distance from a ray LINE to the vertex set, reduced to
    a <thr boolean.  r_ref: (P, 8) rows [o|d|near|far]; v_ref: (3, V').

    For vertex v and the infinite line (o, d):
      b = d.(v - o),  a = |v - o|^2,  dist^2 = a - b^2 / |d|^2
    Both v.d and v.o are MXU matmuls; the rest is a short elementwise
    chain.  line min <= segment min <= min over the discrete samples, so
    thresholding at the prune radius is a strict superset of "any sample
    survives the exact 5cm test".  (The segment clamp to [near, far] was
    measured ~40% slower for no ray reduction: rays whose line passes the
    body but whose segment doesn't are already AABB-misses, and the
    combined mask is AND-ed with mask_at_box.)"""
    r = r_ref[:]
    o, d = r[:, 0:3], r[:, 3:6]
    dd_inv = 1.0 / jnp.maximum(jnp.sum(d * d, axis=1, keepdims=True), 1e-12)
    best = jnp.full((r.shape[0], 1), jnp.inf, jnp.float32)
    for t in range(n_vtiles):
        v = v_ref[:, pl.ds(t * V_TILE, V_TILE)]          # (3, VT)
        # exact elementwise form: a = |v-o|^2 and b = d.(v-o) built from
        # true f32 per-coordinate differences (the matmul expansion at
        # DEFAULT MXU precision erred ~5e-2 m^2 and dropped real rays)
        w0 = v[0:1, :] - o[:, 0:1]
        w1 = v[1:2, :] - o[:, 1:2]
        w2 = v[2:3, :] - o[:, 2:3]
        a = jnp.square(w0) + jnp.square(w1) + jnp.square(w2)
        b = d[:, 0:1] * w0 + d[:, 1:2] * w1 + d[:, 2:3] * w2
        dist = a - b * b * dd_inv
        best = jnp.minimum(best, jnp.min(dist, axis=1, keepdims=True))
    out_ref[:] = (best < thr).astype(jnp.int32)


def ray_body_mask_pallas(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                         near: jnp.ndarray, far: jnp.ndarray,
                         verts: jnp.ndarray, threshold_sq: float,
                         interpret: bool = None):
    """(N,) bool: does the ray segment [near, far] pass within
    sqrt(threshold_sq) of ANY vertex?  False -> every sample of the ray
    fails the exact prune test and the ray composites to background.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = ray_o.shape[0]
    v = verts.shape[0]
    n_pad = -n % RSEG_P
    v_pad = -v % V_TILE
    ctr = jnp.mean(verts.astype(jnp.float32), axis=0)
    rows = jnp.concatenate([
        ray_o.astype(jnp.float32) - ctr, ray_d.astype(jnp.float32),
        near.astype(jnp.float32)[:, None], far.astype(jnp.float32)[:, None],
    ], axis=-1)
    rows = jnp.pad(rows, ((0, n_pad), (0, 0)))
    vt = jnp.pad(verts.astype(jnp.float32) - ctr, ((0, v_pad), (0, 0)),
                 constant_values=SENTINEL).T
    out = pl.pallas_call(
        functools.partial(_ray_seg_kernel, n_vtiles=vt.shape[1] // V_TILE,
                          thr=float(threshold_sq)),
        grid=(rows.shape[0] // RSEG_P,),
        in_specs=[
            pl.BlockSpec((RSEG_P, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vt.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RSEG_P, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows.shape[0], 1), jnp.int32),
        interpret=interpret,
    )(rows, vt)
    return out[:n, 0] > 0


def nn_1_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                interpret: bool = False):
    """query: (N, 3); ref: (V, 3) -> (dist_sq (N,), idx (N,))."""
    n = query.shape[0]
    v = ref.shape[0]
    n_pad = -n % P_TILE
    v_pad = -v % V_TILE
    # center on the vertex centroid: distances are translation-invariant
    # and smaller magnitudes shrink the bf16x3 cancellation error
    ctr = jnp.mean(ref.astype(jnp.float32), axis=0)
    qt = jnp.pad(query.astype(jnp.float32) - ctr, ((0, n_pad), (0, 0)))  # (N', 3)
    vt = jnp.pad(ref.astype(jnp.float32) - ctr, ((0, v_pad), (0, 0)),
                 constant_values=SENTINEL).T                          # (3, V')
    n_tiles = qt.shape[0] // P_TILE
    n_vtiles = vt.shape[1] // V_TILE

    dist, idx = pl.pallas_call(
        functools.partial(_knn_kernel, n_vtiles=n_vtiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((P_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vt.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((P_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qt.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((qt.shape[0], 1), jnp.int32),
        ],
        interpret=interpret,
    )(qt, vt)
    return dist[:n, 0], idx[:n, 0]


def nn_1_tables_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                       tables: jnp.ndarray, interpret: bool = False):
    """query: (N, 3); ref: (V, 3); tables: (V, C) per-vertex payload.
    Returns (dist_sq (N,), idx (N,), payload (N, C) == tables[idx]).

    The payload is gathered OUTSIDE the kernel: the in-kernel one-hot MXU
    form needed a bf16x3 table split once the precision fix landed (two
    heavy (P,VT)x(VT,C) passes), while an XLA row gather of N rows is
    ~1.6ms at the production count AND exactly f32."""
    dist, idx = nn_1_pallas(query, ref, interpret=interpret)
    return dist, idx, jnp.take(tables, idx, axis=0)
