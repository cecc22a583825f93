"""Nearest-SMPL-vertex queries (K=1).

Replaces pytorch3d ``knn_points`` (reference renderer.py:315, 564, 627).
A brute-force distance scan over the 6,890 vertices, phrased as a
matmul-shaped reduction:  d2(i,j) = |q_i|^2 - 2 q_i.v_j + |v_j|^2, argmin_j.

``nn_1_ref`` is the chunked jnp implementation (XLA fuses the broadcast into
the argmin reduction, so the (chunk, V) intermediate stays on-chip).
``nn_1`` is the dispatch point; a Pallas kernel with a running argmin over
vertex tiles plugs in here when profiling shows XLA leaving throughput on
the table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _nn_chunk(q: jnp.ndarray, ref: jnp.ndarray, ref_sq: jnp.ndarray):
    """q: (C, 3); ref: (3, V); ref_sq: (V,).  Returns (d2 (C,), idx (C,))."""
    qv = jnp.dot(q, ref, preferred_element_type=jnp.float32)  # (C, V)
    d2 = ref_sq[None, :] - 2.0 * qv
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
    q_sq = jnp.sum(q * q, axis=-1)
    return best + q_sq, idx


def nn_1_ref(query: jnp.ndarray, ref: jnp.ndarray, chunk: int = 8192):
    """query: (N, 3); ref: (V, 3).  Returns (dist_sq (N,), idx (N,)) of the
    nearest reference point for every query.  N is padded internally to a
    multiple of ``chunk`` and processed with lax.map to bound memory."""
    n = query.shape[0]
    if n <= chunk:
        return _nn_chunk(query.astype(jnp.float32), ref.T.astype(jnp.float32),
                         jnp.sum(ref.astype(jnp.float32) ** 2, axis=-1))
    pad = (-n) % chunk
    q = jnp.pad(query.astype(jnp.float32), ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)
    ref_t = ref.T.astype(jnp.float32)
    ref_sq = jnp.sum(ref.astype(jnp.float32) ** 2, axis=-1)
    d2, idx = lax.map(functools.partial(_nn_chunk, ref=ref_t, ref_sq=ref_sq), q)
    return d2.reshape(-1)[:n], idx.reshape(-1)[:n]


def nn_1(query: jnp.ndarray, ref: jnp.ndarray, chunk: int = 8192):
    """Dispatch: the Pallas kernel on TPU backends (2.6x the jnp version on
    v5e — distances stay in VMEM), the chunked jnp reference elsewhere.
    Large vertex sets take the clustered branch-and-bound kernel (exact:
    bound-justified cluster skipping, same elementwise distances)."""
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        from sherf_tpu.kernels import knn_pallas as kp

        if kp.CLUSTERED and ref.shape[0] >= 8 * kp.C_SIZE:
            return kp.nn_1_clustered_pallas(query, ref)
        return kp.nn_1_pallas(query, ref)
    return nn_1_ref(query, ref, chunk=chunk)


def nn_1_diag(query: jnp.ndarray, ref: jnp.ndarray, s_cap: int = 0,
              chunk: int = 8192):
    """K=1 NN with a shortlist-overflow diagnostic slot.

    With ``s_cap`` > 0 on a TPU backend, dispatches to the per-tile
    cluster-shortlist kernel (knn_pallas.nn_1_shortlist_pallas) and
    returns (dist_sq, idx, overflow).  NOTE: with the current DYNAMIC
    shortlist kernel the overflow is ALWAYS 0 — the kernel visits however
    many clusters the exactness bound requires (its ``s_cap`` is ignored),
    so results are exact by construction and the renderer's
    ``knn_shortlist_overflow`` diag counter cannot fire.  The third return
    is kept so a future FIXED-capacity shortlist kernel (which genuinely
    can overflow) plugs into the same renderer plumbing: callers must
    treat a positive value exactly like a capacity-budget overflow.
    Without a TPU backend or with ``s_cap`` == 0, falls back to the exact
    full-scan dispatch, also with overflow == 0."""
    backend = jax.default_backend()
    if backend in ("tpu", "axon") and s_cap > 0:
        from sherf_tpu.kernels import knn_pallas as kp

        if ref.shape[0] >= 8 * kp.C_SIZE:
            d2, idx, needed = kp.nn_1_shortlist_pallas(query, ref, s_cap)
            return d2, idx, jnp.maximum(needed - s_cap, 0)
    d2, idx = nn_1(query, ref, chunk=chunk)
    return d2, idx, jnp.zeros((), jnp.int32)


def nn_1_tables_diag(query: jnp.ndarray, ref: jnp.ndarray,
                     tables: jnp.ndarray, s_cap: int = 0,
                     chunk: int = 8192):
    """nn_1_diag fused with the per-vertex payload gather: returns
    (dist_sq, idx, tables[idx], overflow)."""
    d2, idx, ov = nn_1_diag(query, ref, s_cap, chunk=chunk)
    return d2, idx, jnp.take(tables, idx, axis=0), ov


def nn_1_tables(query: jnp.ndarray, ref: jnp.ndarray, tables: jnp.ndarray,
                chunk: int = 8192):
    """K=1 KNN fused with a per-vertex payload lookup: returns
    (dist_sq (N,), idx (N,), tables[idx] (N, C)).

    On TPU the payload comes out of the KNN kernel via one-hot MXU matmuls
    (kernels/knn_pallas.py) — replacing N random row gathers (~10ns each)
    with matmul-speed work.  Elsewhere: jnp KNN + a plain gather."""
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        d2, idx = nn_1(query, ref)
        return d2, idx, jnp.take(tables, idx, axis=0)
    d2, idx = nn_1_ref(query, ref, chunk=chunk)
    return d2, idx, jnp.take(tables, idx, axis=0)
