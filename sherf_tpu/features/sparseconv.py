"""Sparse 3D feature volume over the canonical SMPL body — TPU-native
replacement for spconv (reference renderer.SparseConvNet, renderer.py:708-871,
and the SparseConvTensor construction in triplane.py:129-137).

Design: the volume has only ~6,890 occupied sites (one per warped SMPL
vertex) inside a ~128x352x416 voxel grid, so dense 3D convs would waste
~2000x the FLOPs.  Instead features live on a static-capacity *site list*:

  * an int32 dense *index grid* (site id + 1, 0 = empty) gives O(1)
    neighbor lookup — rebuilt per forward by one scatter;
  * submanifold conv  = 27 neighbor gathers + one (S,27,Ci)x(27,Ci,Co)
    einsum (MXU-shaped), computed only at occupied sites, exactly matching
    spconv's SubMConv3d semantics (empty neighbors contribute zero, site
    set unchanged);
  * strided conv      = emit the <=8 candidate parent sites per input site,
    dedupe through an occupancy grid, compact with jnp.nonzero(size=cap)
    (static shapes), then gather the 3x3x3 stride-2 input window per output
    site.  This reproduces SparseConv3d(kernel 3, stride 2, pad 1) exactly
    up to the static site capacity;
  * readout           = trilinear interpolation of the sparse volume via
    8 index-grid lookups per query (replaces .dense() + grid_sample,
    renderer.py:764-791), using the reference's coordinate convention:
    full-res voxel coords normalized by out_sh, align_corners=True per
    scale.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np
import flax.linen as nn
import jax
from jax import lax
import jax.numpy as jnp

from sherf_tpu.kernels.segment_accum import weighted_gather

VOXEL_SIZE = 0.005  # meters (renderer.py:550, triplane.py:194)

# Scales whose conv stages run in DENSE form (see SparseConvNet): the
# hypothesis was that at the coarse scales the occupied fraction (4-10%)
# is high enough that one XLA 3D conv over the dense grid — pure MXU
# work, zero per-site gathers — beats the 27-tap gathered sparse form.
# Scale s = number of stride-2 downsamples applied to the grid a stage
# READS: conv1/down1 read s=1, conv2/down2 read s=2, conv3 reads s=3.
# s=0 (the 18.7M-voxel full-res grid) must never go dense (the densified
# tensor alone is ~1.2GB).  DEFAULT OFF after the r5 on-chip A/B: the
# dense form LOST at every scale combo — render 118.3 ("23") / 117.4
# ("3") / 144.6 ("123") vs 117.7 ms sparse, train step 219.4 ("23") vs
# 209.8 ms — the densify/BN-mask grid passes outweigh the gathers saved.
# Env A/B knob retained: SHERF_DENSE_SCALES="" (all sparse) .. "123".
DENSE_SCALES = frozenset(
    int(c) for c in os.environ.get("SHERF_DENSE_SCALES", "")) - {0}


def prepare_voxel_volume(t_vertices: np.ndarray, pad: float = 0.05,
                         voxel_size: float = VOXEL_SIZE):
    """Static volume geometry from the canonical (big-pose) vertices
    (triplane.prepare_sp_input, triplane.py:174-217).

    Returns (min_dhw (3,), out_sh (3,) ints) — out_sh rounded up to the next
    multiple of 32 via the reference's ``(x | 31) + 1``.
    """
    t_vertices = np.asarray(t_vertices)
    min_xyz = t_vertices.min(0) - pad
    max_xyz = t_vertices.max(0) + pad
    min_dhw = min_xyz[[2, 1, 0]]
    max_dhw = max_xyz[[2, 1, 0]]
    out_sh = np.ceil((max_dhw - min_dhw) / voxel_size).astype(np.int32)
    out_sh = (out_sh | 31) + 1
    return min_dhw.astype(np.float32), tuple(int(s) for s in out_sh)


def voxelize_coords(xyz: jnp.ndarray, min_dhw, voxel_size: float = VOXEL_SIZE):
    """World points -> integer dhw voxel coords (triplane.py:191-195)."""
    dhw = xyz[..., [2, 1, 0]]
    return jnp.round((dhw - jnp.asarray(min_dhw)) / voxel_size).astype(jnp.int32)


def world_to_voxel_f(xyz: jnp.ndarray, min_dhw, voxel_size: float = VOXEL_SIZE):
    """World points -> float dhw voxel coords (renderer.get_grid_coords,
    renderer.py:544-556, before normalization)."""
    dhw = xyz[..., [2, 1, 0]]
    return (dhw - jnp.asarray(min_dhw)) / voxel_size


def _flat(coords: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    return (coords[..., 0] * shape[1] + coords[..., 1]) * shape[2] + coords[..., 2]


def _inbounds(coords: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    ok = (coords[..., 0] >= 0) & (coords[..., 0] < shape[0])
    ok &= (coords[..., 1] >= 0) & (coords[..., 1] < shape[1])
    ok &= (coords[..., 2] >= 0) & (coords[..., 2] < shape[2])
    return ok


def build_index_grid(coords: jnp.ndarray, valid: jnp.ndarray,
                     shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Flat int32 grid of (site index + 1); 0 marks empty voxels."""
    size = shape[0] * shape[1] * shape[2]
    ok = valid & _inbounds(coords, shape)
    flat = jnp.where(ok, _flat(coords, shape), size)  # size -> dropped
    ids = jnp.arange(1, coords.shape[0] + 1, dtype=jnp.int32)
    return jnp.zeros((size,), jnp.int32).at[flat].set(ids, mode="drop")


def gather_sites(feats: jnp.ndarray, grid: jnp.ndarray,
                 shape: Tuple[int, int, int], coords: jnp.ndarray) -> jnp.ndarray:
    """Features at integer voxel coords (zero when empty / out of bounds).

    feats: (S, C); grid: flat (D*H*W,); coords: (..., 3) int.
    """
    ok = _inbounds(coords, shape)
    flat = jnp.clip(_flat(coords, shape), 0, grid.shape[0] - 1)
    idx = grid[flat] * ok.astype(jnp.int32)  # 0 == empty
    feats_pad = jnp.concatenate([jnp.zeros((1, feats.shape[-1]), feats.dtype), feats], 0)
    return feats_pad[idx]


_OFFSETS = np.stack(np.meshgrid(np.arange(3), np.arange(3), np.arange(3),
                                indexing="ij"), -1).reshape(27, 3) - 1  # (27,3)


def neighbor_ids(grid, shape, base_coords):
    """(S, 27) padded site ids (id+1; 0 = empty/out-of-bounds) of the 3x3x3
    neighborhood of each base coord — ONE int-grid gather.  Computed once
    per stage and shared by that stage's convs (each device gather op
    carries ~0.1ms fixed cost; the per-offset form cost ~55ms/frame)."""
    nbr_coords = base_coords[:, None, :] + jnp.asarray(_OFFSETS)[None]  # (S,27,3)
    ok = _inbounds(nbr_coords, shape)
    flat = jnp.clip(_flat(nbr_coords, shape), 0, grid.shape[0] - 1)
    return grid[flat.reshape(-1)].reshape(flat.shape) * ok.astype(jnp.int32)


def pack_grid_yx(grid, shape, n_sites: int):
    """Flat index grid -> (size, 9) rows: packed[v, dy*3+dx] = id of the
    voxel at v + (0, dy-1, dx-1), zeros beyond the (h, w) edges.

    TPU gathers are per-ROW-cost bound (~8ns/row, flat up to ~128-byte
    rows), so widening the grid to 9 ids per row turns the 27 scalar taps
    of :func:`neighbor_ids` into the 3 row taps of
    :func:`neighbor_ids_packed` — measured ~17ms/frame of neighbor-id
    gathers at the production shape.  Rows are int16 when every id fits
    (``n_sites`` < 32767 — always, for a SMPL body at the calibrated
    caps), halving the build bandwidth; int32 otherwise.
    """
    D, H, W = shape
    g = grid.reshape(D, H, W)
    dt = jnp.int16 if n_sites < (1 << 15) - 1 else jnp.int32
    gp = jnp.pad(g.astype(dt), ((0, 0), (1, 1), (1, 1)))
    cols = [gp[:, dy:H + dy, dx:W + dx] for dy in range(3) for dx in range(3)]
    return jnp.stack(cols, axis=-1).reshape(D * H * W, 9)


def neighbor_ids_packed(packed, shape, base_coords):
    """(S, 27) neighborhood ids (same layout as :func:`neighbor_ids`) from
    a :func:`pack_grid_yx` grid — 3 row gathers (one per dz) instead of 27
    scalar taps."""
    D, H, W = shape
    y = base_coords[:, 1]
    x = base_coords[:, 2]
    out = []
    for dz in (-1, 0, 1):
        cz = base_coords[:, 0] + dz
        okz = ((cz >= 0) & (cz < D)).astype(jnp.int32)
        flat = (jnp.clip(cz, 0, D - 1) * H + y) * W + x
        rows = jnp.take(packed, flat, axis=0).astype(jnp.int32)  # (S, 9)
        out.append(rows * okz[:, None])
    return jnp.concatenate(out, axis=1)  # (S, 27), _OFFSETS order


def invert_neighbor_ids(nbr, valid_out, n_in):
    """inv[j, k] = 1 + the output row whose k-th neighbor is input site
    id j+1 (0 = none).  Exact and duplicate-free: for a fixed offset k the
    map (output site -> its k-th neighbor) is injective over valid rows, so
    the scatter below never collides.  Invalid (padding) output rows are
    dropped — they can share coords and would otherwise overwrite real
    entries."""
    S_out, K = nbr.shape
    tgt = jnp.where(valid_out[:, None] & (nbr > 0), nbr, 0)
    rows = jnp.broadcast_to(
        jnp.arange(1, S_out + 1, dtype=jnp.int32)[:, None], (S_out, K))
    inv = jnp.zeros((n_in + 1, K), jnp.int32)
    inv = inv.at[tgt, jnp.arange(K, dtype=jnp.int32)[None, :]].set(
        rows, mode="drop")
    return inv[1:]


def _neighbor_gather_fwd(feats, nbr, inv_nbr, valid_in):
    feats_pad = jnp.concatenate(
        [jnp.zeros((1, feats.shape[-1]), feats.dtype), feats], 0)
    out = feats_pad[nbr.reshape(-1)].reshape(*nbr.shape, feats.shape[-1])
    return out, (inv_nbr, valid_in)


def _neighbor_gather_bwd(res, g):
    """Transpose of a fixed-offset neighbor gather = neighbor gather along
    the inverse offsets: d_in[j] = sum_k g[inv[j,k]-1, k] — a pure gather,
    no scatter (XLA's duplicate-heavy scatter-add here cost ~25ms/step) and
    no rounding.  Sites j where inv points nowhere read the zero row."""
    inv_nbr, valid_in = res
    S_in, K = inv_nbr.shape
    C = g.shape[-1]
    gpad = jnp.concatenate([jnp.zeros((1, K, C), g.dtype), g], 0)
    flat = inv_nbr * K + jnp.arange(K, dtype=jnp.int32)[None, :]  # inv=0 -> row0
    d = gpad.reshape(-1, C)[flat.reshape(-1)].reshape(S_in, K, C)
    d = jnp.sum(d.astype(jnp.float32), axis=1)
    # the inverse table only covers valid rows; scatter semantics give
    # exactly zero at invalid (padding) input rows
    d = d * valid_in[:, None]
    return d.astype(g.dtype), None, None, None


@jax.custom_vjp
def neighbor_gather(feats, nbr, inv_nbr, valid_in):
    """feats: (S_in, Ci) -> (S_out, K, Ci) rows at padded ids ``nbr``
    (0 = empty -> zero row), with an inverse-gather adjoint via
    ``inv_nbr`` (see :func:`invert_neighbor_ids`)."""
    return _neighbor_gather_fwd(feats, nbr, inv_nbr, valid_in)[0]


neighbor_gather.defvjp(_neighbor_gather_fwd, _neighbor_gather_bwd)


def _conv_rows(feats, nbr):
    fp = jnp.concatenate(
        [jnp.zeros((1, feats.shape[-1]), feats.dtype), feats], 0)
    return fp[nbr.reshape(-1)].reshape(*nbr.shape, feats.shape[-1])


@jax.custom_vjp
def _conv_core(feats, nbr, w, inv_nbr, valid_in):
    """out[s] = sum_k w[k] . feats[nbr[s,k]-1] (0 = zero row).

    feats: (S_in, Ci); nbr: (S_out, K); w: (K, Ci, Co);
    inv_nbr: (S_in, K) inverse table (see invert_neighbor_ids).

    The backward is the TRANSPOSED conv, computed without materializing
    the (S_out, K, Ci) gathered-rows cotangent the autodiff-through-
    neighbor_gather form produced (~35 ms/step of gathers + reshapes +
    converts on the production train step):
      d_feats[j] = sum_k  g[inv[j,k]-1] @ w[k].T     (one Co-wide gather
                                                      + one einsum)
      d_w[k]     = rows.T @ g                        (rows recomputed —
                                                      cheaper than saving
                                                      the 27-tap tensor)
    """
    return jnp.einsum("ski,kio->so", _conv_rows(feats, nbr), w)


def _conv_core_fwd(feats, nbr, w, inv_nbr, valid_in):
    return _conv_core(feats, nbr, w, inv_nbr, valid_in), (
        feats, nbr, w, inv_nbr, valid_in)


def _conv_core_bwd(res, g):
    feats, nbr, w, inv_nbr, valid_in = res
    Co = g.shape[-1]
    gpad = jnp.concatenate([jnp.zeros((1, Co), g.dtype), g], 0)
    grow = gpad[inv_nbr.reshape(-1)].reshape(*inv_nbr.shape, Co)
    d_feats = jnp.einsum("jko,kio->ji", grow, w,
                         preferred_element_type=jnp.float32)
    d_feats = (d_feats * valid_in[:, None]).astype(feats.dtype)
    d_w = jnp.einsum("ski,so->kio", _conv_rows(feats, nbr), g,
                     preferred_element_type=jnp.float32).astype(w.dtype)
    return d_feats, None, d_w, None, None


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def conv3d_by_ids(feats, nbr, weight, inv_nbr, valid_in, train: bool = True):
    """Sparse 3x3x3 conv given precomputed neighbor ids (S, 27) and their
    inverse table (S_in, 27).

    K padding (27 -> 32): pads the neighborhood with empty ids and zero
    weight taps so the gathered (S*27, C) -> (S, 27, C) reshape is
    layout-preserving (27 is not a multiple of the sublane tile; the
    relayout traced ~5ms/frame of the eval render at sparseconv.py:228 —
    -2ms measured end-to-end, r5).  Keyed on ``train``: EVAL pads (the
    forward-only program keeps the saving), TRAINING does not (the extra
    5 zero taps cost ~18ms/step in the backward, whose adjoint re-gathers
    every tap — r3 A/B).  SHERF_CONV_KPAD overrides both modes.  Zero-id
    taps read the zero row and contribute exactly nothing either way."""
    import os

    K = nbr.shape[1]
    default = "27" if train else "32"
    pad = -K % int(os.environ.get("SHERF_CONV_KPAD", default))
    if pad:
        nbr = jnp.pad(nbr, ((0, 0), (0, pad)))
        inv_nbr = jnp.pad(inv_nbr, ((0, 0), (0, pad)))
    w = weight.reshape(K, weight.shape[-2], weight.shape[-1])
    if pad:
        w = jnp.concatenate(
            [w, jnp.zeros((pad,) + w.shape[1:], w.dtype)], axis=0)
    return _conv_core(feats, nbr, w.astype(feats.dtype), inv_nbr, valid_in)


def subm_conv3d(feats, coords, grid, shape, weight, valid_in,
                train: bool = True):
    """Submanifold conv: out[s] = sum_k W[k] . in[coord_s + k].

    feats: (S, Ci); weight: (3, 3, 3, Ci, Co).  Returns (S, Co).
    The inverse neighbor table is free: _OFFSETS[26-k] == -_OFFSETS[k] and
    in/out share the site grid, so inv = nbr reversed along k."""
    nbr = neighbor_ids(grid, shape, coords)
    return conv3d_by_ids(feats, nbr, weight, nbr[:, ::-1], valid_in,
                         train=train)


def stride_conv3d(feats, grid_in, shape_in, out_coords, weight, valid_out,
                  valid_in, train: bool = True):
    """Strided conv (kernel 3, stride 2, pad 1): out[o] = sum_k W[k] .
    in[2*o + k - 1].  Returns (S_out, Co)."""
    nbr = neighbor_ids(grid_in, shape_in, 2 * out_coords)
    inv = invert_neighbor_ids(nbr, valid_out, feats.shape[0])
    return conv3d_by_ids(feats, nbr, weight, inv, valid_in, train=train)


def stride_conv3d_packed(feats, packed_in, shape_in, out_coords, weight,
                         valid_out, valid_in, train: bool = True):
    """:func:`stride_conv3d` with neighbor ids from a yx-packed grid."""
    nbr = neighbor_ids_packed(packed_in, shape_in, 2 * out_coords)
    inv = invert_neighbor_ids(nbr, valid_out, feats.shape[0])
    return conv3d_by_ids(feats, nbr, weight, inv, valid_in, train=train)


def downsample_sites(coords_in, valid_in, shape_in, cap: int):
    """Site set of SparseConv3d(stride 2, pad 1): every output voxel whose
    3x3x3 stride-2 window touches an occupied input voxel.

    Input voxel v is touched by parent p iff |2p - v| <= 1 per axis, i.e.
    p in {v//2} (v even) or {(v-1)/2, (v+1)/2} (v odd) — at most 2 per
    axis, 8 candidates per site.  Dedupe by a scatter-WINNER round: every
    candidate writes its list position into a dense scratch grid (last
    writer wins, deterministically) and reads it back; the one candidate
    per voxel that reads its own position is that voxel's unique
    representative.  The compaction then runs over the 8*S candidate list
    (~100x smaller than the dense-grid form it replaces — reduce_window
    over the full index grid + multi-million-element mask compactions
    measured ~5ms/frame; sorting the full candidate list instead lowered
    to ~4ms of XLA sort loops).  A final sort over just the <=cap winners
    restores ascending-flat site order — consumers address sites through
    the index grid so outputs are order-invariant, but spatially-local
    queries hitting ascending ids keeps the downstream row gathers
    cache-friendly (scrambled order measured +7ms/frame)."""
    from sherf_tpu.kernels.compaction import compact_mask
    shape_out = tuple((s - 1) // 2 + 1 for s in shape_in)
    size_out = shape_out[0] * shape_out[1] * shape_out[2]

    cands = []
    for sel in range(8):
        # per axis the touched parents are {v//2, (v+1)//2} (from
        # 2p-1 <= v <= 2p+1): equal for even v, distinct for odd v
        delta = jnp.asarray([sel >> a & 1 for a in range(3)], jnp.int32)
        p = (coords_in + delta) // 2
        ok = valid_in & _inbounds(p, shape_out)
        cands.append(jnp.where(ok, _flat(p, shape_out), size_out))
    cand = jnp.concatenate(cands)                     # (M,) flat or sentinel
    M = cand.shape[0]
    pos = jnp.arange(M, dtype=jnp.int32)
    scratch = jnp.full((size_out,), -1, jnp.int32).at[cand].set(
        pos, mode="drop")
    winner = (jnp.take(scratch, jnp.clip(cand, 0, size_out - 1)) == pos) \
        & (cand < size_out)
    n_occ = jnp.sum(winner.astype(jnp.int32))
    slot, new_valid = compact_mask(winner, cap)
    idx = jnp.sort(jnp.where(new_valid, cand[jnp.minimum(slot, M - 1)],
                             size_out))
    new_valid = idx < size_out
    idx = jnp.where(new_valid, idx, 0)
    d = idx // (shape_out[1] * shape_out[2])
    h = (idx // shape_out[2]) % shape_out[1]
    w = idx % shape_out[2]
    new_coords = jnp.stack([d, h, w], -1).astype(jnp.int32)
    # occupied sites beyond the cap are silently dropped by the compaction;
    # callers surface this count (must be 0 for a correctly calibrated cap)
    overflow = jnp.maximum(n_occ - cap, 0)
    return new_coords, new_valid, shape_out, overflow


def trilinear_dense_sample(feats, coords, valid, shape, pos):
    """Trilinear interpolation via a densified feature grid.

    Numerically identical to :func:`trilinear_site_sample` but one memory
    hop per corner instead of two: the (S, C) site features are scattered
    into a dense (D*H*W, C) buffer once (S ~ 7k sites), then each of the 8
    corners is a single wide-row gather.  The index-grid variant's corner
    lookups are 4-byte random reads from a multi-million-entry int grid —
    measured ~3x slower on v5e for ~1M queries.

    feats: (S, C); coords: (S, 3) int; pos: (N, 3) float voxel coords.
    """
    size = shape[0] * shape[1] * shape[2]
    ok = valid & _inbounds(coords, shape)
    flat = jnp.where(ok, _flat(coords, shape), size)
    dense = jnp.zeros((size, feats.shape[-1]), feats.dtype).at[flat].set(
        feats * ok[:, None].astype(feats.dtype), mode="drop")

    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - p0.astype(pos.dtype)
    out = 0.0
    for o in np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                      -1).reshape(8, 3):
        corner = p0 + o
        inb = _inbounds(corner, shape)
        cflat = jnp.clip(_flat(corner, shape), 0, size - 1)
        w = jnp.prod(jnp.where(o[None, :] == 1, frac, 1.0 - frac), axis=-1)
        w = (w * inb).astype(feats.dtype)
        out = out + dense[cflat] * w[:, None]
    return out


def trilinear_dense_sample_x(feats, coords, valid, shape, pos):
    """Trilinear interpolation via an X-PACKED dense grid — 4 row gathers
    per query instead of 8 (one per (d, h) corner pair; each packed row
    holds both w corners).  Bit-identical to :func:`trilinear_dense_sample`:
    the same per-corner f32 weights are cast to the feature dtype before the
    multiply, and out-of-bounds corners contribute exact zeros.

    TPU gather cost is ~flat in row width but linear in tap count, and tap
    pairs pipeline (tools/profile_gather_law.py), so halving the taps
    halves the dominant cost of the 3D feature bank.

    feats: (S, C); coords: (S, 3) int dhw; pos: (N, 3) float voxel coords.
    """
    D, H, W = shape
    size = D * H * W
    C = feats.shape[-1]
    ok = valid & _inbounds(coords, shape)
    flat = jnp.where(ok, _flat(coords, shape), size)
    dense = jnp.zeros((size, C), feats.dtype).at[flat].set(
        feats * ok[:, None].astype(feats.dtype), mode="drop")
    dense = dense.reshape(D, H, W, C)
    p = jnp.pad(dense, ((0, 0), (0, 0), (0, 1), (0, 0)))
    packed = jnp.concatenate([p[:, :, :W], p[:, :, 1:W + 1]],
                             axis=-1).reshape(size, 2 * C)

    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - p0.astype(pos.dtype)
    z0, y0, x0 = p0[:, 0], p0[:, 1], p0[:, 2]
    fz, fy, fx = frac[:, 0], frac[:, 1], frac[:, 2]

    bx = jnp.clip(x0, 0, W - 1)
    # x-corner group of the base row: corner x0+dx sits in channel group
    # clip(x0+dx-bx, 0, 1); OOB x corners get weight zero
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            cz = z0 + dz
            cy = y0 + dy
            okzy = (cz >= 0) & (cz < D) & (cy >= 0) & (cy < H)
            rows = jnp.take(
                packed,
                (jnp.clip(cz, 0, D - 1) * H + jnp.clip(cy, 0, H - 1)) * W + bx,
                axis=0)
            wzy = (jnp.where(dz == 1, fz, 1.0 - fz)
                   * jnp.where(dy == 1, fy, 1.0 - fy))
            for dx in (0, 1):
                cx = x0 + dx
                okx = (cx >= 0) & (cx < W)
                g1 = jnp.clip(cx - bx, 0, 1)  # 0 or 1: channel group
                w = (wzy * jnp.where(dx == 1, fx, 1.0 - fx)
                     * (okzy & okx)).astype(feats.dtype)[:, None]
                grp = jnp.where(g1[:, None] == 0, rows[:, :C], rows[:, C:])
                out = out + grp * w
    return out


def trilinear_dense_sample_xy(feats, coords, valid, shape, pos):
    """Trilinear interpolation via an XY-PACKED dense grid — 2 row gathers
    per query (one per z corner; each packed row holds the 2x2 (h, w)
    corner block).  Bit-identical to :func:`trilinear_dense_sample` (same
    per-corner f32 weights cast to the feature dtype before multiply, exact
    zeros outside).

    feats: (S, C); coords: (S, 3) int dhw; pos: (N, 3) float voxel coords.
    """
    D, H, W = shape
    size = D * H * W
    C = feats.shape[-1]
    ok = valid & _inbounds(coords, shape)
    flat = jnp.where(ok, _flat(coords, shape), size)
    dense = jnp.zeros((size, C), feats.dtype).at[flat].set(
        feats * ok[:, None].astype(feats.dtype), mode="drop")
    dense = dense.reshape(D, H, W, C)
    p = jnp.pad(dense, ((0, 0), (0, 1), (0, 1), (0, 0)))
    packed = jnp.concatenate([
        p[:, :H, :W], p[:, :H, 1:W + 1],
        p[:, 1:H + 1, :W], p[:, 1:H + 1, 1:W + 1],
    ], axis=-1).reshape(size, 4 * C)

    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - p0.astype(pos.dtype)
    z0, y0, x0 = p0[:, 0], p0[:, 1], p0[:, 2]
    fz, fy, fx = frac[:, 0], frac[:, 1], frac[:, 2]

    by = jnp.clip(y0, 0, H - 1)
    bx = jnp.clip(x0, 0, W - 1)
    out = 0.0
    for dz in (0, 1):
        cz = z0 + dz
        okz = (cz >= 0) & (cz < D)
        rows = jnp.take(
            packed, (jnp.clip(cz, 0, D - 1) * H + by) * W + bx, axis=0)
        wz = jnp.where(dz == 1, fz, 1.0 - fz)
        for dy in (0, 1):
            cy = y0 + dy
            oky = (cy >= 0) & (cy < H)
            gy = jnp.clip(cy - by, 0, 1)
            wzy = wz * jnp.where(dy == 1, fy, 1.0 - fy)
            for dx in (0, 1):
                cx = x0 + dx
                okx = (cx >= 0) & (cx < W)
                gx = jnp.clip(cx - bx, 0, 1)
                g = gy * 2 + gx  # channel group 0..3
                w = (wzy * jnp.where(dx == 1, fx, 1.0 - fx)
                     * (okz & oky & okx)).astype(feats.dtype)[:, None]
                # branchless group select (no per-point gather)
                grp = jnp.where((g == 0)[:, None], rows[:, :C], 0.0)
                grp = jnp.where((g == 1)[:, None], rows[:, C:2 * C], grp)
                grp = jnp.where((g == 2)[:, None], rows[:, 2 * C:3 * C], grp)
                grp = jnp.where((g == 3)[:, None], rows[:, 3 * C:], grp)
                out = out + grp.astype(feats.dtype) * w
    return out


_CORNERS8 = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                     -1).reshape(8, 3)


def trilinear_dense_sample_packed(feats, coords, valid, shape, pos):
    """Trilinear interpolation via a CORNER-PACKED dense grid — ONE row
    gather per query.  (Alternative to :func:`trilinear_dense_sample`;
    measured slower end-to-end on v5e — the 8x scatter to build the packed
    grid outweighs the saved gathers at SHERF's ~0.5M query scale.)

    Random row gathers are latency-bound (~10-16ns each on v5e) regardless
    of width, so instead of gathering 8 corner rows we scatter every site
    into the (size, 8, C) packed rows of its 8 base texels (8 x S scatter
    updates, S ~ 8k) and gather a single (8, C) row per query.  Numerics
    match :func:`trilinear_dense_sample` exactly.

    feats: (S, C); coords: (S, 3) int; pos: (N, 3) float voxel coords.
    """
    D, H, W = shape
    size = D * H * W
    C = feats.shape[-1]
    ok = valid & _inbounds(coords, shape)
    fz = feats * ok[:, None].astype(feats.dtype)

    packed = jnp.zeros((size, 8, C), feats.dtype)
    for k, o in enumerate(_CORNERS8):
        base = coords - o
        okb = ok & _inbounds(base, shape)
        flat = jnp.where(okb, _flat(base, shape), size)
        packed = packed.at[flat, k].set(fz, mode="drop")

    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - p0.astype(pos.dtype)).astype(feats.dtype)
    b = jnp.clip(p0, 0, jnp.asarray(shape, jnp.int32) - 1)
    rows = jnp.take(packed.reshape(size, 8 * C),
                    _flat(b, shape), axis=0).reshape(-1, 8, C)

    # fold the per-corner group remap (needed only at clipped boundaries)
    # into per-group weights, then one weighted sum over the 8 groups
    wg = jnp.zeros((pos.shape[0], 8), feats.dtype)
    for o in _CORNERS8:
        cz = p0 + o
        inb = _inbounds(cz, shape)
        g = (jnp.clip(cz[:, 0] - b[:, 0], 0, 1) * 4
             + jnp.clip(cz[:, 1] - b[:, 1], 0, 1) * 2
             + jnp.clip(cz[:, 2] - b[:, 2], 0, 1))
        w = jnp.prod(jnp.where(o[None, :] == 1, frac, 1.0 - frac), axis=-1)
        onehot = (g[:, None] == jnp.arange(8)[None, :]).astype(feats.dtype)
        wg = wg + onehot * (w * inb.astype(feats.dtype))[:, None]
    return jnp.einsum("nk,nkc->nc", wg, rows)


def trilinear_site_sample_packed(feats, grid, shape, pos):
    """Trilinear readout with a CORNER-PACKED index grid: the 8 corner site
    ids of each base cell live in one (size, 8) int32 row, so a query costs
    ONE grid-row gather + one (N, 8)-row feature gather from the small site
    table — instead of 8 separate 4-byte grid lookups + 8 feature lookups
    (measured ~53ms/frame across the 3 scales at 262k queries).

    Matches :func:`trilinear_site_sample` numerically (same f32 weights,
    zeros at empty/out-of-bounds corners).
    """
    D, H, W = shape
    size = D * H * W
    C = feats.shape[-1]
    g = grid.reshape(D, H, W)
    gp = jnp.pad(g, ((0, 1), (0, 1), (0, 1)))
    packed = jnp.stack([gp[dz:D + dz, dy:H + dy, dx:W + dx]
                        for dz, dy, dx in _CORNERS8],
                       axis=-1).reshape(size, 8)

    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - p0.astype(pos.dtype)
    b = jnp.clip(p0, 0, jnp.asarray(shape, jnp.int32) - 1)
    rows = jnp.take(packed, _flat(b, shape), axis=0)        # (N, 8) ids

    # per-group weights factorize per axis: packed slot g of base row b
    # holds the grid value at b+g, and the corner p0+o lands in slot
    # g = o + (p0 - b), so wg[:, (gz,gy,gx)] = prod_axis wa[:, g_a] with
    # wa the 1-D interpolation weight of axis-corner o_a = g_a - delta_a
    # (zero when o_a is outside {0,1} or the coordinate is out of bounds).
    # The 8-corner fold this replaces cost ~41ms/step in (N,8) elementwise
    # traffic; this is 6 (N,) weights + one outer product.
    def axis_w(c, f, dim):
        delta = c - jnp.clip(c, 0, dim - 1)
        out = []
        for g in (0, 1):
            o = g - delta
            valid = (o >= 0) & (o <= 1) & (c + o >= 0) & (c + o <= dim - 1)
            out.append(jnp.where(valid, jnp.where(o == 1, f, 1.0 - f), 0.0))
        return out  # [(N,), (N,)]

    wz = axis_w(p0[:, 0], frac[:, 0], shape[0])
    wy = axis_w(p0[:, 1], frac[:, 1], shape[1])
    wx = axis_w(p0[:, 2], frac[:, 2], shape[2])
    wg = jnp.stack([wz[gz] * wy[gy] * wx[gx]
                    for gz, gy, gx in _CORNERS8], axis=-1)  # (N, 8)

    feats_pad = jnp.concatenate(
        [jnp.zeros((1, C), feats.dtype), feats], 0)
    # fused weighted gather: forward is the elementwise sum over the 8
    # corner rows (an einsum here becomes 262k tiny (1,8)x(8,C) matmuls,
    # ~5ms/frame measured); backward accumulates the table gradient as
    # weighted multi-hot matmuls instead of a duplicate-heavy scatter.
    # w_grad=False: the weights derive from query positions, which are
    # pure data (ray samples + SMPL warps) — no parameter ever needs their
    # cotangent, and XLA kept the ~8ms/step d_w re-gather otherwise.
    return weighted_gather(feats_pad, rows, wg, w_grad=False)


def trilinear_site_sample_pairpacked(feats, grid, shape, coords, valid, pos):
    """Trilinear readout with a corner-packed GRID and a w-PAIR-packed
    FEATURE table: one (N, 8) grid-row gather + FOUR feature taps of 2C
    width (instead of 8 taps of C) — each packed row holds a site's
    features and its +w neighbor's, so the two x-corners of every (z, y)
    corner pair come from one tap.  Numerically identical to
    :func:`trilinear_site_sample_packed` (same f32 weights, exact zeros at
    empty corners; summation pairs the x-corners first).

    feats: (S, C); grid: flat (D*H*W,); coords: (S, 3) int dhw; valid:
    (S,); pos: (N, 3) float voxel coords.
    """
    from sherf_tpu.kernels.segment_accum import paired_weighted_gather

    D, H, W = shape
    size = D * H * W
    C = feats.shape[-1]
    g = grid.reshape(D, H, W)
    gp = jnp.pad(g, ((0, 1), (0, 1), (0, 1)))
    packed = jnp.stack([gp[dz:D + dz, dy:H + dy, dx:W + dx]
                        for dz, dy, dx in _CORNERS8],
                       axis=-1).reshape(size, 8)

    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - p0.astype(pos.dtype)
    b = jnp.clip(p0, 0, jnp.asarray(shape, jnp.int32) - 1)
    rows = jnp.take(packed, _flat(b, shape), axis=0)        # (N, 8) ids

    def axis_w(c, f, dim):
        delta = c - jnp.clip(c, 0, dim - 1)
        out = []
        for gk in (0, 1):
            o = gk - delta
            ok = (o >= 0) & (o <= 1) & (c + o >= 0) & (c + o <= dim - 1)
            out.append(jnp.where(ok, jnp.where(o == 1, f, 1.0 - f), 0.0))
        return out

    wz = axis_w(p0[:, 0], frac[:, 0], shape[0])
    wy = axis_w(p0[:, 1], frac[:, 1], shape[1])
    wx = axis_w(p0[:, 2], frac[:, 2], shape[2])

    # pair-packed feature table: pf[s] = [feats[s] | feats[site at
    # coords(s) + (0,0,1)]] — the +w neighbor id is one small gather
    nxt = coords + jnp.asarray([0, 0, 1], jnp.int32)
    okn = valid & _inbounds(nxt, shape)
    wnbr = jnp.take(grid, jnp.clip(_flat(nxt, shape), 0, size - 1)
                    ) * okn.astype(jnp.int32)               # (S,) id or 0
    feats_pad = jnp.concatenate([jnp.zeros((1, C), feats.dtype), feats], 0)
    pf = jnp.concatenate([feats, feats_pad[wnbr]], axis=-1)  # (S, 2C)
    pf_pad = jnp.concatenate([jnp.zeros((1, 2 * C), feats.dtype), pf], 0)

    # per (z, y) corner pair: tap the x-corner's row when occupied (its
    # second half IS the x+1 corner), else the x+1 corner's row (first
    # half only — its second half would be the x+2 corner)
    ids, was, wbs = [], [], []
    for p, (gz, gy, gx) in enumerate(_CORNERS8[::2]):
        w0 = wz[gz] * wy[gy] * wx[0]
        w1 = wz[gz] * wy[gy] * wx[1]
        i0 = rows[:, 2 * p]
        i1 = rows[:, 2 * p + 1]
        use0 = i0 > 0
        ids.append(jnp.where(use0, i0, i1))
        was.append(jnp.where(use0, w0, w1))
        wbs.append(jnp.where(use0, w1, 0.0))
    ids4 = jnp.stack(ids, axis=-1)
    wa = jnp.stack(was, axis=-1)
    wb = jnp.stack(wbs, axis=-1)
    return paired_weighted_gather(pf_pad, ids4, wa, wb)


def trilinear_site_sample(feats, grid, shape, pos):
    """Trilinear interpolation of the sparse volume at float voxel positions
    (zeros at empty voxels — identical to .dense() + grid_sample).

    feats: (S, C); pos: (N, 3) float dhw coords in scale-local pixels.
    """
    p0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - p0.astype(pos.dtype)
    out = 0.0
    for o in np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                      -1).reshape(8, 3):
        corner = p0 + o
        w = jnp.prod(jnp.where(o[None, :] == 1, frac, 1.0 - frac), axis=-1)
        out = out + gather_sites(feats, grid, shape, corner) * w[:, None]
    return out


def densify_sites(feats, coords, valid, shape):
    """(S, C) site features -> flat (D*H*W, C) dense grid (zeros at empty
    voxels) — the scatter half of the dense-conv path (S ~ 4-21k rows,
    negligible next to the grid traffic)."""
    size = shape[0] * shape[1] * shape[2]
    ok = valid & _inbounds(coords, shape)
    flat = jnp.where(ok, _flat(coords, shape), size)
    return jnp.zeros((size, feats.shape[-1]), feats.dtype).at[flat].set(
        feats * ok[:, None].astype(feats.dtype), mode="drop")


def gather_dense_at_sites(dense_flat, coords, valid, shape):
    """Read site rows back out of a flat dense grid (inverse of
    :func:`densify_sites`); invalid/out-of-bounds rows read zero."""
    ok = valid & _inbounds(coords, shape)
    flat = jnp.clip(_flat(coords, shape), 0, dense_flat.shape[0] - 1)
    return jnp.take(dense_flat, flat, axis=0) * ok[:, None].astype(
        dense_flat.dtype)


def dense_conv3d(dense_flat, shape, weight, stride: int = 1):
    """XLA 3D conv over a flat dense grid: kernel 3, pad 1, ``stride``.

    dense_flat: (D*H*W, Ci); weight: (3, 3, 3, Ci, Co) (DHWIO — the sparse
    path's native layout).  Returns the flat (D'*H'*W', Co) output where
    each output dim is (s - 1)//2 + 1 for stride 2 (matching
    :func:`downsample_sites`' SparseConv3d geometry) or unchanged for
    stride 1 (SubMConv3d evaluated everywhere; gathering at the input
    site set afterwards reproduces submanifold semantics exactly, since
    empty voxels hold zeros).
    """
    D, H, W = shape
    x = dense_flat.reshape(1, D, H, W, dense_flat.shape[-1])
    y = lax.conv_general_dilated(
        x, weight.astype(x.dtype), (stride,) * 3, [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y.reshape(-1, weight.shape[-1])


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the site dim with an explicit validity mask
    (spconv pairs every conv with BatchNorm1d(eps=1e-3, momentum=0.01),
    renderer.py:800-871)."""

    momentum: float = 0.01  # torch momentum: new = (1-m)*old + m*batch
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))

        if train:
            # batch statistics, no running-average writes: the step stays a
            # pure function (running stats are refreshed by an explicit
            # calibration pass / checkpoint import instead)
            m = mask.astype(x.dtype)[:, None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=0) / cnt
            var = jnp.sum(jnp.square(x - mean) * m, axis=0) / cnt
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class SparseStage(nn.Module):
    """n_convs x (SubMConv3d + BN + ReLU) (double_conv/triple_conv,
    renderer.py:812-859)."""

    out_channels: int
    n_convs: int

    @nn.compact
    def __call__(self, feats, coords, packed, shape, valid, train: bool = False,
                 dense: bool = False):
        if dense:
            # dense form (coarse scales): scatter once, run the stage's
            # convs as XLA 3D convs on the MXU, gather the site rows back.
            # Identical math to the sparse form — empty voxels hold zeros,
            # and masking after each BN+ReLU (whose bias would otherwise
            # light up empty voxels) restores the submanifold invariant.
            size = shape[0] * shape[1] * shape[2]
            ok = valid & _inbounds(coords, shape)
            flat = jnp.where(ok, _flat(coords, shape), size)
            x = densify_sites(feats, coords, valid, shape)
            occ = jnp.zeros((size, 1), x.dtype).at[flat].set(
                jnp.ones((feats.shape[0], 1), x.dtype), mode="drop")
            occ_b = occ[:, 0] > 0
            for i in range(self.n_convs):
                cin = x.shape[-1]
                w = self.param(f"conv{i}", nn.initializers.variance_scaling(
                    1.0, "fan_in", "normal"),
                    (3, 3, 3, cin, self.out_channels))
                x = dense_conv3d(x, shape, w)
                x = MaskedBatchNorm(name=f"bn{i}")(x, occ_b, train=train)
                x = nn.relu(x) * occ
            return gather_dense_at_sites(x, coords, valid, shape)
        # submanifold convs share the site set: one neighbor-id gather
        # serves every conv in the stage (and, reversed, every adjoint)
        nbr = neighbor_ids_packed(packed, shape, coords)
        inv = nbr[:, ::-1]
        for i in range(self.n_convs):
            cin = feats.shape[-1]
            w = self.param(f"conv{i}", nn.initializers.variance_scaling(
                1.0, "fan_in", "normal"), (3, 3, 3, cin, self.out_channels))
            feats = conv3d_by_ids(feats, nbr, w, inv, valid, train=train)
            feats = MaskedBatchNorm(name=f"bn{i}")(feats, valid, train=train)
            feats = nn.relu(feats) * valid[:, None]
        return feats


class SparseDown(nn.Module):
    """SparseConv3d(stride 2) + BN + ReLU (stride_conv, renderer.py:862-871)."""

    out_channels: int
    cap: int

    @nn.compact
    def __call__(self, feats, coords, grid, packed, shape, valid,
                 train: bool = False, dense: bool = False,
                 need_packed: bool = True):
        new_coords, new_valid, new_shape, overflow = downsample_sites(
            coords, valid, shape, self.cap)
        self.sow("diag", "site_overflow", overflow,
                 init_fn=lambda: jnp.zeros((), jnp.int32),
                 reduce_fn=jnp.maximum)
        cin = feats.shape[-1]
        w = self.param("conv", nn.initializers.variance_scaling(
            1.0, "fan_in", "normal"), (3, 3, 3, cin, self.out_channels))
        if dense:
            # dense stride-2 conv (same geometry as downsample_sites'
            # SparseConv3d: kernel 3, pad 1, stride 2), read back at the
            # new site set
            y = dense_conv3d(densify_sites(feats, coords, valid, shape),
                             shape, w, stride=2)
            out = gather_dense_at_sites(y, new_coords, new_valid, new_shape)
        else:
            out = stride_conv3d_packed(feats, packed, shape, new_coords, w,
                                       new_valid, valid, train=train)
        out = MaskedBatchNorm(name="bn")(out, new_valid, train=train)
        out = nn.relu(out) * new_valid[:, None]
        new_grid = build_index_grid(new_coords, new_valid, new_shape)
        new_packed = (pack_grid_yx(new_grid, new_shape, new_coords.shape[0])
                      if need_packed else None)
        return out, new_coords, new_grid, new_packed, new_shape, new_valid


class SparseConvNet(nn.Module):
    """Multi-scale sparse feature volume with trilinear readout
    (reference SparseConvNet, renderer.py:708-797; num_layers=4 emits
    32 + 64 + 96 = 192 channels)."""

    num_layers: int = 4
    out_sh: Tuple[int, int, int] = (128, 352, 416)  # static, dataset-dependent
    caps: Tuple[int, int, int] = (8192, 8192, 8192)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, query_dhw, valid=None, train: bool = False):
        """feats: (S, 32) per-site features; coords: (S, 3) int dhw voxel
        coords at full res; query_dhw: (N, 3) float full-res voxel coords of
        the sample points.  Returns (N, 32+64+96) multi-scale features."""
        if valid is None:
            valid = jnp.ones(feats.shape[0], bool)
        # ``train`` selects the training READOUT form below (the w-pair
        # packing halves forward taps but doubles the backward's multi-hot
        # table accumulation).  BatchNorm stays in running-stats mode
        # either way: the train step is a pure function whose BN stats are
        # refreshed by an explicit calibration pass / checkpoint import
        # (see MaskedBatchNorm) — threading ``train`` into BN mid-round
        # changed the training dynamics and broke the tuned convergence /
        # grad-A/B gates.
        bn_train = False
        feats = feats.astype(self.dtype)
        shape = self.out_sh
        grid = build_index_grid(coords, valid, shape)
        packed = pack_grid_yx(grid, shape, coords.shape[0])

        # per-scale dense-conv dispatch (DENSE_SCALES): conv1/down1 read
        # the s=1 grid, conv2/down2 s=2, conv3 s=3; a down emits the
        # yx-packed neighbor grid only when the next scale's consumers
        # still run sparse
        d1, d2, d3 = (s in DENSE_SCALES for s in (1, 2, 3))

        feats = SparseStage(32, 2, name="conv0")(feats, coords, packed, shape, valid, bn_train)
        feats, coords, grid, packed, shape, valid = SparseDown(32, self.caps[0], name="down0")(
            feats, coords, grid, packed, shape, valid, bn_train,
            need_packed=not d1)

        outs = []
        full = np.asarray(self.out_sh, np.float32)

        def readout(f, g, s, co, va):
            # reference convention (renderer.py:544-556 + grid_sample
            # align_corners=True): u = dhw/out_sh*2-1 over the scale-s
            # volume.  Index-grid site sampling reuses the conv stack's
            # existing grid — no dense feature grid is ever built
            # (measured 6x faster than the dense-scatter readout at the
            # half-res scale, tools/profile_readout3d.py).  Inference uses
            # the w-pair-packed form (4 taps of 2C instead of 8 of C);
            # training keeps the 8-tap form — pairing doubles the
            # backward's multi-hot table accumulation, which outweighs the
            # forward gather saving in the train step.
            scale = (np.asarray(s, np.float32) - 1.0) / full
            if train:
                return trilinear_site_sample_packed(f, g, s,
                                                    query_dhw * scale)
            return trilinear_site_sample_pairpacked(f, g, s, co, va,
                                                    query_dhw * scale)

        if self.num_layers > 1:
            feats = SparseStage(32, 2, name="conv1")(feats, coords, packed, shape, valid, bn_train, dense=d1)
            outs.append(readout(feats, grid, shape, coords, valid))
            feats, coords, grid, packed, shape, valid = SparseDown(64, self.caps[1], name="down1")(
                feats, coords, grid, packed, shape, valid, bn_train,
                dense=d1, need_packed=not d2)
        if self.num_layers > 2:
            feats = SparseStage(64, 3, name="conv2")(feats, coords, packed, shape, valid, bn_train, dense=d2)
            outs.append(readout(feats, grid, shape, coords, valid))
            feats, coords, grid, packed, shape, valid = SparseDown(96, self.caps[2], name="down2")(
                feats, coords, grid, packed, shape, valid, bn_train,
                dense=d2, need_packed=not d3)
        if self.num_layers > 3:
            feats = SparseStage(96, 3, name="conv3")(feats, coords, packed, shape, valid, bn_train, dense=d3)
            outs.append(readout(feats, grid, shape, coords, valid))
        return jnp.concatenate(outs, axis=-1)
