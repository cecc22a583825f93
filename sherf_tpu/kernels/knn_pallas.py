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
# P=512 keeps the elementwise form's live (P, VT) f32 temps (three
# per-coordinate difference tiles + the accumulated d2 tile) inside the
# 16MB scoped-vmem budget with headroom; 1024 was over budget for the
# earlier bf16x3 split variant and buys nothing here (VPU-bound)
_V_ENV = int(os.environ.get("SHERF_KNN_V", "0"))      # fixed vertex tile (A/B)
SENTINEL = 1e6     # padded-vertex coordinate


def _vtile_for(v: int, p_tile: int = None) -> int:
    """Vertex tile for a scan over ``v`` vertices: round V up to the next
    lane multiple (128) and split into the fewest equal tiles whose
    (P, VT) f32 temps stay within ~14MB of the 16MB scoped-vmem budget.

    The old fixed V_TILE=2048 padded SMPL's 6890 vertices to 8192 — an
    18.9% dead-column overhead every kernel paid on every frame; minimal
    padding (6890 -> 2x3456 = 6912, 0.3%) measured -5.4 ms on the
    production 512x512x48 render (r5 A/B, BASELINE.md)."""
    if _V_ENV:
        return _V_ENV
    p = p_tile or P_TILE
    vmax = max(128, (7 * 1024 * 1024) // (4 * p) // 128 * 128)
    n = -(-v // vmax)                       # tiles needed under the budget
    return -(-(-(-v // n)) // 128) * 128    # ceil(v / n) rounded up to 128

# clustered (branch-and-bound) kernel knobs: vertices are Morton-sorted
# per frame and chunked into clusters of C_SIZE; the kernel visits a
# cluster only when its bound can still beat a point's current best.
# DEFAULT OFF: A/B on the production 512x512x48 frame measured the
# clustered dispatch at 209.8 ms sustained vs 138.1 ms for the full-scan
# kernels (r4) — compacted KNN queries are all body-proximal, so the
# bound test skips few clusters while every tile pays the ~54-cluster
# sequential pl.when chain + the (P, Cp) bound precompute.  The kernels
# stay available (exactness is pinned by test_knn.py) for workloads with
# far-field queries.
C_SIZE = int(os.environ.get("SHERF_KNN_CSIZE", "128"))
CLUSTERED = os.environ.get("SHERF_KNN_CLUSTER", "0") != "0"


def _morton_spread(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so they occupy every 3rd bit."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_order(verts: jnp.ndarray) -> jnp.ndarray:
    """(V,) int32 permutation sorting vertices along a Morton curve of
    their CURRENT (posed) positions — consecutive chunks of the sorted
    order are spatially tight clusters, articulation included (a template
    partition would smear across joints; this re-sorts every frame for
    the cost of one 6890-key argsort)."""
    v = verts.astype(jnp.float32)
    lo = jnp.min(v, axis=0)
    hi = jnp.max(v, axis=0)
    g = jnp.clip((v - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0,
                 0.0, 1023.0).astype(jnp.uint32)
    code = ((_morton_spread(g[:, 0]) << 2)
            | (_morton_spread(g[:, 1]) << 1)
            | _morton_spread(g[:, 2]))
    return jnp.argsort(code).astype(jnp.int32)


def _cluster_stats_sized(vs_pad: jnp.ndarray, n_real: int, csize: int):
    """Per-cluster centroid and radius over consecutive `csize` chunks.
    vs_pad: (C*csize, 3) Morton-sorted vertices, rows >= n_real padding.
    The radius carries a small inflation so every f32-rounded bound built
    from it stays CONSERVATIVE (never prunes the true nearest vertex)."""
    C = vs_pad.shape[0] // csize
    grp = vs_pad.reshape(C, csize, 3)
    mask = jnp.arange(C * csize).reshape(C, csize) < n_real
    cnt = jnp.maximum(jnp.sum(mask, axis=1), 1)[:, None]
    ctr = jnp.sum(jnp.where(mask[..., None], grp, 0.0), axis=1) / cnt
    r2 = jnp.max(jnp.where(mask, jnp.sum(jnp.square(grp - ctr[:, None]), -1),
                           0.0), axis=1)
    rad = jnp.sqrt(r2) * (1.0 + 1e-5) + 1e-6
    # empty (all-padding) clusters: park the centroid on the sentinel so
    # their lower bound is astronomically large -> never visited
    ctr = jnp.where((jnp.sum(mask, axis=1) == 0)[:, None], SENTINEL, ctr)
    return ctr, rad


def _cluster_stats(vs_pad: jnp.ndarray, n_real: int):
    return _cluster_stats_sized(vs_pad, n_real, C_SIZE)


def _knn_kernel(q_ref, v_ref, dist_ref, idx_ref, *, n_vtiles: int,
                v_tile: int):
    """q_ref: (8, P) TRANSPOSED queries (rows 0-2 = xyz, rest pad);
    v_ref: (V_pad, 8) (cols 0-2 = xyz); dist_ref/idx_ref: (1, 8, P).

    Distance tiles are laid out (VT, P) — queries along the 128-lane axis
    — so the min/argmin reduce over SUBLANES, not lanes: the lane-axis
    reduction of the previous (P, VT) layout measured ~40% more device
    time for the same element count (r5 A/B, tools/profile_knn_t.py,
    exact-match verified)."""
    q = q_ref[:]                                     # (8, P)
    best = jnp.full((1, P_TILE), jnp.inf, jnp.float32)
    best_i = jnp.zeros((1, P_TILE), jnp.int32)
    for t in range(n_vtiles):
        v = v_ref[pl.ds(t * v_tile, v_tile), :]      # (VT, 8)
        # exact elementwise difference form: |q - v|^2 built from true
        # f32 subtractions — no cancellation of large |q|^2-ish terms, so
        # no MXU precision concerns (the matmul expansion at DEFAULT MXU
        # precision erred ~5e-2 m^2; bf16x3 splits cost ~3 extra passes
        # for ~the same VPU traffic as this form)
        d2 = jnp.square(v[:, 0:1] - q[0:1, :])
        d2 = d2 + jnp.square(v[:, 1:2] - q[1:2, :])
        d2 = d2 + jnp.square(v[:, 2:3] - q[2:3, :])  # (VT, P)
        m = jnp.min(d2, axis=0, keepdims=True)       # (1, P)
        i = jnp.argmin(d2, axis=0, keepdims=True).astype(jnp.int32) + t * v_tile
        upd = m < best
        best = jnp.where(upd, m, best)
        best_i = jnp.where(upd, i, best_i)
    dist_ref[:] = jnp.broadcast_to(best, (8, P_TILE))[None]
    idx_ref[:] = jnp.broadcast_to(best_i, (8, P_TILE))[None]


def _knn_cluster_kernel(q_ref, v_ref, c_ref, r_ref, dist_ref, idx_ref,
                        best_scr, bi_scr, *, n_clusters: int):
    """Branch-and-bound exact K=1 over Morton clusters.

    q_ref: (P, 3); v_ref: (3, C*S) Morton-sorted; c_ref: (3, Cp) cluster
    centroids; r_ref: (1, Cp) radii.  Per point: best is initialized to
    min_c (d_c + r_c)^2 (an upper bound on the true NN distance — some
    vertex of the nearest cluster is at most that far), then cluster c is
    visited only when its lower bound (d_c - r_c)^2 can still beat the
    running best of SOME point in the tile.  Never skips the true-NN
    cluster: its lower bound <= true d2 <= running best.  Distance tiles
    use the same exact elementwise form as _knn_kernel, so visited-cluster
    results are bit-identical to the full scan."""
    q = q_ref[:]                                        # (P, 3)
    cc = c_ref[:]                                       # (3, Cp)
    rr = r_ref[:]                                       # (1, Cp)
    dc2 = jnp.square(q[:, 0:1] - cc[0:1, :])
    dc2 = dc2 + jnp.square(q[:, 1:2] - cc[1:2, :])
    dc2 = dc2 + jnp.square(q[:, 2:3] - cc[2:3, :])      # (P, Cp)
    dc = jnp.sqrt(dc2)
    lb = jnp.square(jnp.maximum(dc - rr, 0.0))          # (P, Cp)
    ub = jnp.min(jnp.square(dc + rr), axis=1, keepdims=True)
    # cushion: the ub expression rounds differently from the exact
    # elementwise d2 a visited cluster produces; keep ub strictly above
    # the true NN distance so the winning vertex always updates best
    best_scr[:] = ub * (1.0 + 1e-5) + 1e-12
    bi_scr[:] = jnp.zeros((q.shape[0], 1), jnp.int32)
    for t in range(n_clusters):
        visit = jnp.any(lb[:, t:t + 1] <= best_scr[:])

        @pl.when(visit)
        def _(t=t):
            v = v_ref[:, t * C_SIZE:(t + 1) * C_SIZE]   # (3, S) static slice
            d2 = jnp.square(q[:, 0:1] - v[0:1, :])
            d2 = d2 + jnp.square(q[:, 1:2] - v[1:2, :])
            d2 = d2 + jnp.square(q[:, 2:3] - v[2:3, :])
            m = jnp.min(d2, axis=1, keepdims=True)
            i = (jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32)
                 + t * C_SIZE)
            b = best_scr[:]
            upd = m < b
            best_scr[:] = jnp.where(upd, m, b)
            bi_scr[:] = jnp.where(upd, i, bi_scr[:])

    dist_ref[:] = best_scr[:]
    idx_ref[:] = bi_scr[:]


def nn_1_clustered_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                          interpret: bool = False):
    """Exact K=1 NN via per-frame Morton clustering + branch-and-bound.
    query: (N, 3); ref: (V, 3) -> (dist_sq (N,), idx (N,)) with idx in the
    ORIGINAL vertex numbering.

    The full-scan kernel is VPU-bound at N*V distance pairs; production
    queries are ray-major compacted body samples, so a 512-point tile
    touches a handful of body regions and the bound test skips most of the
    ~54 clusters.  Prep (morton argsort of 6890 keys + permute + cluster
    stats) is plain XLA, ~0.1 ms."""
    n = query.shape[0]
    v = ref.shape[0]
    order = morton_order(ref)
    vs = jnp.take(ref.astype(jnp.float32), order, axis=0)   # (V, 3) sorted
    ctr0 = jnp.mean(vs, axis=0)
    vs = vs - ctr0
    v_pad = -v % C_SIZE
    vs_pad = jnp.pad(vs, ((0, v_pad), (0, 0)), constant_values=SENTINEL)
    n_clusters = vs_pad.shape[0] // C_SIZE
    cent, rad = _cluster_stats(vs_pad, v)                   # (C,3), (C,)
    c_lanes = -n_clusters % 128
    cent_t = jnp.pad(cent, ((0, c_lanes), (0, 0)),
                     constant_values=SENTINEL).T            # (3, Cp)
    rad_t = jnp.pad(rad, (0, c_lanes))[None, :]             # (1, Cp)

    n_pad = -n % P_TILE
    qt = jnp.pad(query.astype(jnp.float32) - ctr0, ((0, n_pad), (0, 0)))
    n_tiles = qt.shape[0] // P_TILE

    dist, idx = pl.pallas_call(
        functools.partial(_knn_cluster_kernel, n_clusters=n_clusters),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((P_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vs_pad.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cent_t.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rad_t.shape[1]), lambda i: (0, 0),
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
        scratch_shapes=[
            pltpu.VMEM((P_TILE, 1), jnp.float32),
            pltpu.VMEM((P_TILE, 1), jnp.int32),
        ],
        interpret=interpret,
    )(qt, vs_pad.T, cent_t, rad_t)
    # map sorted positions back to original vertex ids
    idx_orig = jnp.take(order, jnp.minimum(idx[:n, 0], v - 1))
    return dist[:n, 0], idx_orig


# shortlist-kernel cluster size: bigger than the branch-and-bound C_SIZE
# so the dynamic per-cluster loop amortizes its per-iteration overhead
# (each visit is one (P, SL_CSIZE) distance tile)
SL_CSIZE = int(os.environ.get("SHERF_KNN_SL_CSIZE", "256"))


def _knn_shortlist_kernel(meta_ref, q_ref, v_ref, dist_ref, idx_ref,
                          *, width: int, csize: int):
    """Exact K=1 over a per-tile CLUSTER SHORTLIST with a dynamic visit
    count.

    meta_ref (scalar prefetch): first T entries = per-tile needed-cluster
    counts; then T*width entries = per-tile cluster ids sorted by lower
    bound (wrapper computes both; the first count ids provably contain
    the true nearest vertex of every tile point).  Each visit is one
    aligned dynamic lane slice + a (P, csize) exact elementwise distance
    tile — a bounded fori_loop, so a coherent tile pays ~a handful of
    cluster visits where the full scan pays all 6890 columns, and an
    incoherent tile (image-scanline wrap: its points straddle the whole
    body) degrades gracefully to the full scan instead of overflowing a
    fixed shortlist (r4: worst production tile needed ALL clusters)."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    q = q_ref[:]                                     # (P, 3)
    cnt = meta_ref[t]

    def body(s, carry):
        best, best_i = carry
        cid = meta_ref[n_t + t * width + s]
        base = pl.multiple_of(cid * csize, csize)
        v = v_ref[:, pl.ds(base, csize)]             # (3, csize)
        d2 = jnp.square(q[:, 0:1] - v[0:1, :])
        d2 = d2 + jnp.square(q[:, 1:2] - v[1:2, :])
        d2 = d2 + jnp.square(q[:, 2:3] - v[2:3, :])
        m = jnp.min(d2, axis=1, keepdims=True)
        i = (jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32)
             + base)
        upd = m < best
        return jnp.where(upd, m, best), jnp.where(upd, i, best_i)

    best, best_i = jax.lax.fori_loop(
        0, cnt, body, (jnp.full((q.shape[0], 1), jnp.inf, jnp.float32),
                       jnp.zeros((q.shape[0], 1), jnp.int32)))
    dist_ref[:] = best
    idx_ref[:] = best_i


def nn_1_shortlist_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                          s_cap: int = 0, interpret: bool = False,
                          csize: int = None):
    """Exact K=1 NN via per-tile Morton-cluster shortlists.

    query: (N, 3); ref: (V, 3).  Returns (dist_sq (N,), idx (N,) in the
    ORIGINAL vertex numbering, overflow () int32 — always 0: the id list
    is complete, the per-tile visit COUNT is dynamic).  ``s_cap`` is kept
    for API compatibility and ignored (the dynamic form cannot overflow).

    Per 512-point tile with bounding center c and radius r_t, a cluster k
    (centroid ctr_k, radius r_k) can contain the true NN of some tile
    point only if  lb_k = max(0, |c - ctr_k| - r_k - r_t)^2  is <= the
    tile NN upper bound  ub = (min_k (|c - ctr_k| + r_k) + r_t)^2 — every
    needed cluster's lb sorts before every unneeded one (needed lb <= ub
    < unneeded lb), so visiting the first `count` ids of the lb-sorted
    order is exact.  Compacted render queries are ray-major and
    spatially coherent: most tiles touch one or two body regions and
    visit a handful of the ~28 clusters."""
    del s_cap
    if csize is None:
        csize = SL_CSIZE
    n = query.shape[0]
    v = ref.shape[0]
    order = morton_order(ref)
    # centroid over the UNSORTED array: centered (q - ctr) - (v - ctr)
    # pairs are then bit-identical to nn_1_pallas's (summation order of a
    # permuted f32 mean differs by ~1 ULP, which a distance-equality
    # regression test would see)
    ctr0 = jnp.mean(ref.astype(jnp.float32), axis=0)
    vs = jnp.take(ref.astype(jnp.float32), order, axis=0) - ctr0
    v_pad = -v % csize
    vs_pad = jnp.pad(vs, ((0, v_pad), (0, 0)), constant_values=SENTINEL)
    n_clusters = vs_pad.shape[0] // csize
    cent, rad = _cluster_stats_sized(vs_pad, v, csize)  # (C, 3), (C,)

    n_pad = -n % P_TILE
    qt = jnp.pad(query.astype(jnp.float32) - ctr0, ((0, n_pad), (0, 0)))
    T = qt.shape[0] // P_TILE
    q3 = qt.reshape(T, P_TILE, 3)

    # per-tile bounding sphere (elementwise math only: the MXU's default
    # f32 matmul precision cannot corrupt these conservative bounds, but
    # keep them inflation-guarded against elementwise rounding anyway)
    lo_t = jnp.min(q3, axis=1)
    hi_t = jnp.max(q3, axis=1)
    c_t = 0.5 * (lo_t + hi_t)                           # (T, 3)
    r_t = jnp.sqrt(jnp.max(jnp.sum(jnp.square(q3 - c_t[:, None]), -1),
                           axis=1)) * (1.0 + 1e-5) + 1e-6
    dct = jnp.sqrt(jnp.sum(jnp.square(c_t[:, None] - cent[None]), -1))
    ub_r = (jnp.min(dct + rad[None], axis=1) + r_t) * (1.0 + 1e-5) + 1e-6
    lb_r = jnp.maximum(dct - rad[None] - r_t[:, None], 0.0) * (1.0 - 1e-5)
    needed = lb_r <= ub_r[:, None]                      # (T, C)
    counts = jnp.sum(needed.astype(jnp.int32), axis=1)  # (T,)
    ids = jnp.argsort(lb_r, axis=1).astype(jnp.int32)   # (T, C)
    meta = jnp.concatenate([counts, ids.reshape(-1)])

    dist, idx = pl.pallas_call(
        functools.partial(_knn_shortlist_kernel, width=n_clusters,
                          csize=csize),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((P_TILE, 3), lambda i, meta: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, vs_pad.shape[0]), lambda i, meta: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((P_TILE, 1), lambda i, meta: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P_TILE, 1), lambda i, meta: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((qt.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((qt.shape[0], 1), jnp.int32),
        ],
        interpret=interpret,
    )(meta, qt, vs_pad.T)
    idx_orig = jnp.take(order, jnp.minimum(idx[:n, 0], v - 1))
    return dist[:n, 0], idx_orig, jnp.zeros((), jnp.int32)


# smaller point tile than the KNN kernels: the segment-distance math keeps
# ~5 (P, VT) f32 temps live (vd, vo, b, ts, dist), which at P=1024 blows
# the 16MB scoped-vmem budget (measured: 20.8M)
RSEG_P = int(os.environ.get("SHERF_RSEG_P", "256"))


def _ray_seg_kernel(r_ref, v_ref, out_ref, *, n_vtiles: int, thr: float,
                    v_tile: int):
    """Min squared distance from a ray LINE to the vertex set, reduced to
    a <thr boolean.  r_ref: (P, 8) rows [o|d|active|0]; v_ref: (3, V').

    For vertex v and the infinite line (o, d):
      b = d.(v - o),  a = |v - o|^2,  dist^2 = a - b^2 / |d|^2
    built in exact elementwise form on the VPU.  line min <= segment min
    <= min over the discrete samples, so thresholding at the prune radius
    is a strict superset of "any sample survives the exact 5cm test".
    (The segment clamp to [near, far] was measured ~40% slower for no ray
    reduction: rays whose line passes the body but whose segment doesn't
    are already AABB-misses, and the combined mask is AND-ed with
    mask_at_box.)

    Row 6 carries the per-ray AABB-hit flag: the caller ANDs the
    result with mask_at_box anyway, so a tile with NO hitting ray can skip
    the whole vertex scan (rays are image-raster-ordered — background
    tiles are the common case) and write zeros.  One branch per tile, not
    per cluster (cf. the clustered kernels, whose per-cluster pl.when
    chain measured slower than the scan it saved).

    TRANSPOSED layout (r5): r_ref (8, P) with rays along lanes, v_ref
    (V', 8) — distance tiles (VT, P) reduce over sublanes (see
    :func:`_knn_kernel`)."""
    r = r_ref[:]                                         # (8, P)
    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.max(r[6:7, :]) > 0.0)
    def _():
        dd = r[3:4, :] * r[3:4, :] + r[4:5, :] * r[4:5, :] \
            + r[5:6, :] * r[5:6, :]
        dd_inv = 1.0 / jnp.maximum(dd, 1e-12)            # (1, P)
        best = jnp.full((1, r.shape[1]), jnp.inf, jnp.float32)
        for t in range(n_vtiles):
            v = v_ref[pl.ds(t * v_tile, v_tile), :]      # (VT, 8)
            # exact elementwise form: a = |v-o|^2 and b = d.(v-o) built
            # from true f32 per-coordinate differences (the matmul
            # expansion at DEFAULT MXU precision erred ~5e-2 m^2 and
            # dropped real rays)
            w0 = v[:, 0:1] - r[0:1, :]
            w1 = v[:, 1:2] - r[1:2, :]
            w2 = v[:, 2:3] - r[2:3, :]
            a = jnp.square(w0) + jnp.square(w1) + jnp.square(w2)
            b = r[3:4, :] * w0 + r[4:5, :] * w1 + r[5:6, :] * w2
            dist = a - b * b * dd_inv
            best = jnp.minimum(best, jnp.min(dist, axis=0, keepdims=True))
        out_ref[:] = jnp.broadcast_to((best < thr).astype(jnp.int32),
                                      out_ref.shape[1:])[None]


def _ray_seg_cluster_kernel(r_ref, v_ref, c_ref, rad_ref, out_ref, hit_scr,
                            *, n_clusters: int, thr: float):
    """Clustered branch-and-bound form of _ray_seg_kernel.  A cluster is
    visited only while some not-yet-hit ray's line passes within
    (radius + sqrt(thr)) of its centroid: line-dist(v) >= line-dist(ctr)
    - radius for every member vertex, so skipped clusters cannot contain
    a sub-threshold vertex.  Visited clusters run the exact elementwise
    test, so the output mask is bit-identical to the full scan."""
    r = r_ref[:]
    o, d = r[:, 0:3], r[:, 3:6]
    dd_inv = 1.0 / jnp.maximum(jnp.sum(d * d, axis=1, keepdims=True), 1e-12)
    cc = c_ref[:]                                       # (3, Cp)
    rad = rad_ref[:]                                    # (1, Cp)
    w0 = cc[0:1, :] - o[:, 0:1]
    w1 = cc[1:2, :] - o[:, 1:2]
    w2 = cc[2:3, :] - o[:, 2:3]
    a = jnp.square(w0) + jnp.square(w1) + jnp.square(w2)
    b = d[:, 0:1] * w0 + d[:, 1:2] * w1 + d[:, 2:3] * w2
    dl2 = jnp.maximum(a - b * b * dd_inv, 0.0)          # (P, Cp) line-ctr d2
    # conservative lower bound on line-to-member distance squared
    lb = jnp.square(jnp.maximum(jnp.sqrt(dl2) * (1.0 - 1e-5) - rad, 0.0))
    hit_scr[:] = jnp.zeros((r.shape[0], 1), jnp.int32)
    for t in range(n_clusters):
        visit = jnp.any((lb[:, t:t + 1] < thr) & (hit_scr[:] == 0))

        @pl.when(visit)
        def _(t=t):
            v = v_ref[:, t * C_SIZE:(t + 1) * C_SIZE]
            u0 = v[0:1, :] - o[:, 0:1]
            u1 = v[1:2, :] - o[:, 1:2]
            u2 = v[2:3, :] - o[:, 2:3]
            aa = jnp.square(u0) + jnp.square(u1) + jnp.square(u2)
            bb = d[:, 0:1] * u0 + d[:, 1:2] * u1 + d[:, 2:3] * u2
            dist = aa - bb * bb * dd_inv
            near_hit = jnp.min(dist, axis=1, keepdims=True) < thr
            hit_scr[:] = jnp.maximum(hit_scr[:], near_hit.astype(jnp.int32))

    out_ref[:] = hit_scr[:]


def ray_body_mask_clustered_pallas(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                                   near: jnp.ndarray, far: jnp.ndarray,
                                   verts: jnp.ndarray, threshold_sq: float,
                                   interpret: bool = None):
    """Clustered branch-and-bound variant of ray_body_mask_pallas (same
    contract); most rays miss most of the body's ~54 Morton clusters, and
    hitting rays stop visiting once any cluster passes the test."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = ray_o.shape[0]
    v = verts.shape[0]
    order = morton_order(verts)
    vs = jnp.take(verts.astype(jnp.float32), order, axis=0)
    ctr0 = jnp.mean(vs, axis=0)
    vs = vs - ctr0
    v_pad = -v % C_SIZE
    vs_pad = jnp.pad(vs, ((0, v_pad), (0, 0)), constant_values=SENTINEL)
    n_clusters = vs_pad.shape[0] // C_SIZE
    cent, rad = _cluster_stats(vs_pad, v)
    c_lanes = -n_clusters % 128
    cent_t = jnp.pad(cent, ((0, c_lanes), (0, 0)),
                     constant_values=SENTINEL).T
    rad_t = jnp.pad(rad, (0, c_lanes))[None, :]

    n_pad = -n % RSEG_P
    rows = jnp.concatenate([
        ray_o.astype(jnp.float32) - ctr0, ray_d.astype(jnp.float32),
        near.astype(jnp.float32)[:, None], far.astype(jnp.float32)[:, None],
    ], axis=-1)
    rows = jnp.pad(rows, ((0, n_pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ray_seg_cluster_kernel, n_clusters=n_clusters,
                          thr=float(threshold_sq)),
        grid=(rows.shape[0] // RSEG_P,),
        in_specs=[
            pl.BlockSpec((RSEG_P, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vs_pad.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cent_t.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rad_t.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RSEG_P, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows.shape[0], 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((RSEG_P, 1), jnp.int32)],
        interpret=interpret,
    )(rows, vs_pad.T, cent_t, rad_t)
    return out[:n, 0] > 0


def ray_body_mask_pallas(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                         near: jnp.ndarray, far: jnp.ndarray,
                         verts: jnp.ndarray, threshold_sq: float,
                         interpret: bool = None,
                         active: jnp.ndarray = None):
    """(N,) bool: does the ray segment [near, far] pass within
    sqrt(threshold_sq) of ANY vertex?  False -> every sample of the ray
    fails the exact prune test and the ray composites to background.

    ``active`` (optional (N,) bool): rays already known dead (AABB miss);
    a 256-ray tile whose rays are ALL inactive skips the vertex scan and
    returns False for the tile (the caller ANDs with the same mask, so
    the combined result is unchanged — at 512^2 only ~30% of tiles
    contain a body ray).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n = ray_o.shape[0]
    v = verts.shape[0]
    n_pad = -n % RSEG_P
    # budget as if P=512 even though RSEG_P=256: one (256, 6912) megatile
    # measured 7.5 ms vs 5.5 ms for 2x3456 (r5 trace) — the single-tile
    # loop pipelines worse despite fitting VMEM
    v_tile = _vtile_for(v)
    v_pad = -v % v_tile
    ctr = jnp.mean(verts.astype(jnp.float32), axis=0)
    act = (jnp.ones((n,), jnp.float32) if active is None
           else active.astype(jnp.float32))
    rows = jnp.concatenate([
        ray_o.astype(jnp.float32) - ctr, ray_d.astype(jnp.float32),
        act[:, None], jnp.zeros((n, 1), jnp.float32),
    ], axis=-1)
    rows = jnp.pad(rows, ((0, n_pad), (0, 0))).T              # (8, N')
    vt = jnp.pad(verts.astype(jnp.float32) - ctr, ((0, v_pad), (0, 5)),
                 constant_values=SENTINEL)                    # (V', 8)
    n_tiles = rows.shape[1] // RSEG_P
    out = pl.pallas_call(
        functools.partial(_ray_seg_kernel, n_vtiles=vt.shape[0] // v_tile,
                          thr=float(threshold_sq), v_tile=v_tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, RSEG_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vt.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, RSEG_P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, RSEG_P), jnp.int32),
        interpret=interpret,
    )(rows, vt)
    return out[:, 0, :].reshape(-1)[:n] > 0


def nn_1_pallas(query: jnp.ndarray, ref: jnp.ndarray,
                interpret: bool = False):
    """query: (N, 3); ref: (V, 3) -> (dist_sq (N,), idx (N,))."""
    n = query.shape[0]
    v = ref.shape[0]
    n_pad = -n % P_TILE
    v_tile = _vtile_for(v)
    v_pad = -v % v_tile
    # center on the vertex centroid: distances are translation-invariant
    # and smaller magnitudes shrink the bf16x3 cancellation error
    ctr = jnp.mean(ref.astype(jnp.float32), axis=0)
    qt = jnp.pad(jnp.pad(query.astype(jnp.float32) - ctr,
                         ((0, n_pad), (0, 0))).T,
                 ((0, 5), (0, 0)))                               # (8, N')
    vt = jnp.pad(ref.astype(jnp.float32) - ctr, ((0, v_pad), (0, 5)),
                 constant_values=SENTINEL)                       # (V', 8)
    n_tiles = qt.shape[1] // P_TILE
    n_vtiles = vt.shape[0] // v_tile

    dist, idx = pl.pallas_call(
        functools.partial(_knn_kernel, n_vtiles=n_vtiles, v_tile=v_tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, P_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vt.shape[0], 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, P_TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P_TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, P_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, P_TILE), jnp.int32),
        ],
        interpret=interpret,
    )(qt, vt)
    return dist[:, 0, :].reshape(-1)[:n], idx[:, 0, :].reshape(-1)[:n]


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
