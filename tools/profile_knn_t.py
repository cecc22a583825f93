"""Transposed-layout KNN kernel A/B: d2 tiles as (VT, P) with the
min/argmin over SUBLANES (axis 0) instead of lanes, probing whether the
production kernel's lane-axis reduction is the bottleneck.

Exact elementwise distances (same math as kernels/knn_pallas._knn_kernel);
verifies exact match against the production kernel before timing.

Run: python tools/profile_knn_t.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SENTINEL = 1e6


def timeit(fn, *args, iters=10, warmup=2, tag=""):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:48s}: {ms:8.2f} ms", flush=True)
    return ms


def make_t_variant(p_tile, v_tile):
    def kernel(q_ref, v_ref, dist_ref, idx_ref, *, n_vtiles):
        q = q_ref[:]                                  # (8, P), rows 0-2 live
        best = jnp.full((1, p_tile), jnp.inf, jnp.float32)
        best_i = jnp.zeros((1, p_tile), jnp.int32)
        for t in range(n_vtiles):
            v = v_ref[pl.ds(t * v_tile, v_tile), :]   # (VT, 128), cols 0-2
            d2 = jnp.square(v[:, 0:1] - q[0:1, :])
            d2 = d2 + jnp.square(v[:, 1:2] - q[1:2, :])
            d2 = d2 + jnp.square(v[:, 2:3] - q[2:3, :])  # (VT, P)
            m = jnp.min(d2, axis=0, keepdims=True)
            i = jnp.argmin(d2, axis=0, keepdims=True).astype(jnp.int32) \
                + t * v_tile
            upd = m < best
            best = jnp.where(upd, m, best)
            best_i = jnp.where(upd, i, best_i)
        dist_ref[:] = jnp.broadcast_to(best, (8, p_tile))[None]
        idx_ref[:] = jnp.broadcast_to(best_i, (8, p_tile))[None]

    def run(query, ref):
        n = query.shape[0]
        v = ref.shape[0]
        n_pad = -n % p_tile
        v_pad = -v % v_tile
        ctr = jnp.mean(ref.astype(jnp.float32), axis=0)
        qt = jnp.pad(jnp.pad(query.astype(jnp.float32) - ctr,
                             ((0, n_pad), (0, 0))).T,
                     ((0, 5), (0, 0)))                # (8, N'), rows 0-2
        vt = jnp.pad(ref.astype(jnp.float32) - ctr,
                     ((0, v_pad), (0, int(os.environ.get("VW", "125")))),
                     constant_values=SENTINEL)        # (V', 3+VW), cols 0-2
        n_tiles = qt.shape[1] // p_tile
        dist, idx = pl.pallas_call(
            functools.partial(kernel, n_vtiles=vt.shape[0] // v_tile),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((8, p_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vt.shape[0], vt.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, p_tile), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, p_tile), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, 8, p_tile), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 8, p_tile), jnp.int32),
            ],
        )(qt, vt)
        return dist[:, 0, :].reshape(-1)[:n], idx[:, 0, :].reshape(-1)[:n]

    return run


def main(N=417792, V=6890):
    from sherf_tpu.kernels.knn_pallas import nn_1_pallas

    rng = np.random.RandomState(0)
    verts = jnp.asarray(rng.randn(V, 3).astype(np.float32) * 0.3)
    q = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))

    prod = jax.jit(nn_1_pallas)
    d0, i0 = prod(q, verts)
    timeit(prod, q, verts, tag=f"production nn_1_pallas (N={N})")

    for p_tile, v_tile in ((512, 3456), (1024, 3456), (2048, 3456),
                           (1024, 6912), (512, 1728)):
        try:
            f = jax.jit(make_t_variant(p_tile, v_tile))
            d1, i1 = f(q, verts)
            match = float(jnp.mean((i0 == i1).astype(jnp.float32)))
            dmax = float(jnp.max(jnp.abs(d0 - d1)))
            tag = (f"transposed P={p_tile} VT={v_tile} "
                   f"(match {match:.4f} dmax {dmax:.1e})")
            timeit(f, q, verts, tag=tag)
        except Exception as e:  # noqa: BLE001
            print(f"transposed P={p_tile} VT={v_tile}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
