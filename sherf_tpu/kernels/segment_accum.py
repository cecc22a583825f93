"""Weighted K-corner table gather with a matmul backward.

``weighted_gather(table, ids, w)`` computes ``out[n] = sum_k w[n,k] *
table[ids[n,k]]`` — the interpolation form of every sparse-volume readout
(cf. reference renderer.py:764-797 .dense()+grid_sample).  Its adjoint for
the table,

    d_table[s] = sum_{n,k: ids[n,k]=s} w[n,k] * g[n]

is computed as tiled *weighted multi-hot* matmuls on the MXU instead of a
scatter-add: the readouts hit each site ~100-2000x per frame, which makes
XLA's duplicate-heavy scatter-add serialize (~18ms per readout measured),
while the rank-1-per-query structure means the matmul needs only
2*N*S*C FLOPs — 8x less than treating each (n,k) row separately (a plain
one-hot adjoint measured *slower* than the scatter).  Multi-hot rows and
grad rows are rounded to bf16 (accumulation stays f32), and (t, m) grid
cells whose point tile cannot hit the table tile — per-tile id ranges are
scalar-prefetched — skip their compute.  Only sensible for SMALL tables
(S up to 32768 rows; the per-tile id-range skipping keeps the multi-hot
cost near-linear in occupied tiles as S grows — measured faster than the
scatter fallback up to 32k rows on v5e, the round-1 train-budget sweep).

CPU/other backends fall back to the plain scatter-add adjoint.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# escape hatch for A/B profiling: SHERF_MULTIHOT=0 forces the scatter adjoint
_USE_MULTIHOT = os.environ.get("SHERF_MULTIHOT", "1") != "0"

# tile defaults from an on-chip sweep (tools/bench_train.py, v5e): the out
# block staying VMEM-resident across the point sweep favors WIDE table
# tiles — V=2048 beat 512 by ~21 ms/step on the production train step
# (fewer t-passes over every point tile's multi-hot build); P=2048
# overflows VMEM ((P, V) f32 accumulator), P=512 regresses ~160 ms.
_P_TILE = int(os.environ.get("SHERF_MULTIHOT_P", "1024"))
_V_TILE = int(os.environ.get("SHERF_MULTIHOT_V", "2048"))


def _waccum_kernel(lo_ref, hi_ref, ids_ref, w_ref, g_ref, out_ref, *,
                   v_tile: int, n_k: int, exact_dot: bool):
    """One (table-tile t, point-tile m) grid cell.

    ids/w: (P, K); g: (P, C) bf16; out: (VT, C) f32.  The out block's index
    map depends only on t, so with m innermost it stays resident in VMEM
    across the whole point sweep and accumulates there."""
    t = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = t * v_tile
    # skip cells whose point tile can't hit this table tile (id ranges are
    # computed per point tile outside and scalar-prefetched); compaction
    # emits queries in ray/depth order and site ids are voxel-lex sorted,
    # so tiles cluster in id space
    active = (lo_ref[m] < base + v_tile) & (hi_ref[m] >= base)

    @pl.when(active)
    def _():
        ids = ids_ref[:]                               # (P, K) int32
        w = w_ref[:]                                   # (P, K) f32
        g = g_ref[:]                                   # (P, C) bf16
        # (1, VT) iota broadcast against (P, 1) id columns — a (P, VT)
        # int32 iota would cost p*v*4 bytes of VMEM by itself
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, v_tile), 1) + base
        acc = jnp.zeros((ids.shape[0], v_tile), jnp.float32)
        for k in range(n_k):
            acc += jnp.where(ids[:, k:k + 1] == lane, w[:, k:k + 1], 0.0)
        # bf16 x bf16 -> f32 runs the MXU at native rate with exact f32
        # product accumulation; interpret mode (CPU) lacks that mixed
        # precision, so it upcasts the rounded inputs to f32 to match.
        # dot_general contracting dim 0 of both: (VT, C)
        a = acc.astype(jnp.bfloat16)
        if exact_dot:
            a, g = a.astype(jnp.float32), g.astype(jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            a, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_rows",))
def weighted_accumulate(ids: jnp.ndarray, w: jnp.ndarray, grads: jnp.ndarray,
                        n_rows: int):
    """d_table = zeros(n_rows, C).at[ids].add(w[..., None] * grads[:, None]),
    as MXU matmuls.

    ids/w: (N, K); grads: (N, C).  w and grads are rounded to bf16 (the
    multi-hot accumulation over k and the matmul accumulation are f32).
    """
    N, K = ids.shape
    C = grads.shape[-1]
    c_pad = -C % 128
    m_pad = -N % _P_TILE
    s_pad = -n_rows % _V_TILE
    idsp = jnp.pad(ids.astype(jnp.int32), ((0, m_pad), (0, 0)),
                   constant_values=-1)
    wp = jnp.pad(w.astype(jnp.float32), ((0, m_pad), (0, 0)))
    gp = jnp.pad(grads.astype(jnp.bfloat16), ((0, m_pad), (0, c_pad)))
    S_pad = n_rows + s_pad

    # per point-tile id ranges for cell skipping (id<=0 excluded: row 0 of
    # interpolation tables is the zero row and its gradient is discarded)
    big = jnp.int32(2 ** 30)
    idst = idsp.reshape(-1, _P_TILE, K)
    lo = jnp.min(jnp.where(idst > 0, idst, big), axis=(1, 2))
    hi = jnp.max(idst, axis=(1, 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S_pad // _V_TILE, idsp.shape[0] // _P_TILE),
        in_specs=[
            pl.BlockSpec((_P_TILE, K), lambda t, m, lo, hi: (m, 0)),
            pl.BlockSpec((_P_TILE, K), lambda t, m, lo, hi: (m, 0)),
            pl.BlockSpec((_P_TILE, gp.shape[1]), lambda t, m, lo, hi: (m, 0)),
        ],
        out_specs=pl.BlockSpec((_V_TILE, gp.shape[1]),
                               lambda t, m, lo, hi: (t, 0)),
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_waccum_kernel, v_tile=_V_TILE, n_k=K,
                          exact_dot=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S_pad, gp.shape[1]), jnp.float32),
        interpret=interpret,
    )(lo, hi, idsp, wp, gp)
    return out[:n_rows, :C]


def _scatter_accumulate(ids, w, grads, n_rows):
    """Fallback with the kernel's declared precision: per-row duplicate ids
    combine their f32 weights first (the kernel's multi-hot lane sums),
    then weights and grad rows round to bf16 with f32 accumulation."""
    same = ids[:, :, None] == ids[:, None, :]          # (N, K, K)
    wsum = jnp.einsum("nkj,nj->nk", same.astype(jnp.float32),
                      w.astype(jnp.float32))
    # only the first occurrence of an id in its row carries the lane sum
    first = jnp.argmax(same, axis=-1) == jnp.arange(ids.shape[-1])[None, :]
    wq = jnp.where(first, wsum, 0.0).astype(jnp.bfloat16).astype(jnp.float32)
    gq = grads.astype(jnp.bfloat16).astype(jnp.float32)
    upd = wq[..., None] * gq[:, None, :]               # (N, K, C)
    return jnp.zeros((n_rows, grads.shape[-1]), jnp.float32).at[
        ids.reshape(-1)].add(upd.reshape(-1, grads.shape[-1]), mode="drop")


@functools.lru_cache(maxsize=None)
def _weighted_gather_for(n_rows: int, dtype_name: str, w_grad: bool):
    """custom_vjp instance specialized on the static table shape/dtype
    (residuals may only carry arrays, so S/dtype live in the closure)."""

    @jax.custom_vjp
    def f(table, ids, w):
        rows = table[ids.reshape(-1)].reshape(*ids.shape, table.shape[-1])
        return jnp.sum(rows.astype(w.dtype) * w[..., None], axis=-2)

    def fwd(table, ids, w):
        return f(table, ids, w), (table, ids, w)

    def bwd(res, g):
        table, ids, w = res
        C = g.shape[-1]
        gf = g.reshape(-1, C)
        idf = ids.reshape(-1, ids.shape[-1])
        wf = w.reshape(-1, w.shape[-1])
        if _USE_MULTIHOT and n_rows <= 32768 \
                and jax.default_backend() in ("tpu", "axon"):
            d = weighted_accumulate(idf, wf, gf, n_rows)
        else:
            d = _scatter_accumulate(idf, wf, gf, n_rows)
        if w_grad:
            # d_w re-gathers the rows
            rows = table[ids.reshape(-1)].reshape(*ids.shape, C)
            dw = jnp.einsum("...c,...kc->...k", g, rows.astype(g.dtype))
            dw = dw.astype(w.dtype)
        else:
            # declared-zero: the caller promises the weights' cotangent is
            # never consumed (e.g. query positions are pure data); XLA does
            # not reliably DCE the re-gather (~8ms/step measured kept)
            dw = jnp.zeros_like(w)
        return d.astype(dtype_name), None, dw

    f.defvjp(fwd, bwd)
    return f


def weighted_gather(table: jnp.ndarray, ids: jnp.ndarray, w: jnp.ndarray,
                    w_grad: bool = True):
    """sum_k w[..., k] * table[ids[..., k]] with a matmul adjoint for the
    table gradient.

    table: (S, C); ids/w: (..., K) with ids int32 in [0, S).  S should be
    small (<= 32768; larger tables fall back to the scatter adjoint).
    Returns (..., C) in w's dtype.  Pass ``w_grad=False``
    to declare the weights' gradient dead (returned as zeros).
    """
    return _weighted_gather_for(table.shape[0], str(table.dtype),
                                bool(w_grad))(table, ids, w)


@functools.lru_cache(maxsize=None)
def _paired_weighted_gather_for(n_rows: int, dtype_name: str,
                                force_multihot: bool = False):
    """custom_vjp for :func:`paired_weighted_gather` (static S/dtype)."""

    @jax.custom_vjp
    def f(table, ids, wa, wb):
        C2 = table.shape[-1]
        C = C2 // 2
        # one (N, C) gather + fused FMA per tap, accumulated in sequence:
        # the single (4N)-row gather this replaces materialized an
        # (N, K, 2C) row tensor whose reshape + weighted reduce_sum traced
        # ~4.4 ms/frame across the production readout's three scales (r5);
        # same total gathered rows, no K-major intermediate.
        out = 0.0
        for k in range(ids.shape[-1]):
            rows = jnp.take(table, ids[..., k], axis=0).astype(wa.dtype)
            out = (out + rows[..., :C] * wa[..., k, None]
                   + rows[..., C:] * wb[..., k, None])
        return out

    def fwd(table, ids, wa, wb):
        return f(table, ids, wa, wb), (ids, wa, wb)

    def bwd(res, g):
        ids, wa, wb = res
        C = g.shape[-1]
        gf = g.reshape(-1, C)
        idf = ids.reshape(-1, ids.shape[-1])
        if _USE_MULTIHOT and (n_rows <= 32768 or force_multihot) \
                and jax.default_backend() in ("tpu", "axon"):
            da = weighted_accumulate(idf, wa.reshape(idf.shape), gf, n_rows)
            db = weighted_accumulate(idf, wb.reshape(idf.shape), gf, n_rows)
        else:
            da = _scatter_accumulate(idf, wa.reshape(idf.shape), gf, n_rows)
            db = _scatter_accumulate(idf, wb.reshape(idf.shape), gf, n_rows)
        d = jnp.concatenate([da, db], axis=-1)
        # weights derive from query positions (pure data): cotangent dead
        return (d.astype(dtype_name), None,
                jnp.zeros_like(wa), jnp.zeros_like(wb))

    f.defvjp(fwd, bwd)
    return f


def paired_weighted_gather(table: jnp.ndarray, ids: jnp.ndarray,
                           wa: jnp.ndarray, wb: jnp.ndarray,
                           force_multihot: bool = False):
    """sum_k wa[..,k] * table[ids[..,k], :C] + wb[..,k] * table[ids[..,k], C:].

    The x-PACKED readout form: ``table`` is (S, 2C) with each row holding a
    site's features and its +w-neighbor's features, so a trilinear readout
    needs K=4 row taps instead of 8 (TPU gathers are per-row-cost bound).
    Table adjoint = two weighted multi-hot matmul accumulations (one per
    half); the weights' cotangent is declared dead (query-position data).
    ``force_multihot`` keeps the matmul adjoint above the 32768-row
    heuristic — use when the queries are id-coherent enough for the
    range-skipping to pay (e.g. the obs-image feature table, whose
    scatter-add adjoint measured ~14 ms/step).
    """
    return _paired_weighted_gather_for(table.shape[0], str(table.dtype),
                                       bool(force_multihot))(
        table, ids, wa, wb)
