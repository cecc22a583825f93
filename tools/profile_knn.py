"""KNN kernel variant shoot-out (524k queries x 6890 verts, K=1).

The production kernel (kernels/knn_pallas.py) measures ~39ms — ~80x below
the MXU roofline for the distance matmuls, so the cost is in the VPU
min/argmin over the (P, VT) distance tiles or in per-program overhead.
Variants probe: tile shapes, bf16 distance tiles, min-only + equality
argmin, and a packed single-reduction (distance quantized into the high
bits of an int32, lane index in the low bits).

Run: python tools/profile_knn.py
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
    print(f"{tag:52s}: {ms:8.2f} ms", flush=True)
    return ms


def make_variant(p_tile, v_tile, mode):
    """mode: 'base' (min+argmin per tile), 'minonly' (min per tile, one
    equality pass at the end), 'packed' (quantized dist<<13 | lane as one
    int32 min)."""

    def kernel(q_ref, v_ref, dist_ref, idx_ref, *, n_vtiles):
        q = q_ref[:]
        if mode == "packed":
            best = jnp.full((p_tile, 1), jnp.int32(2**31 - 1))
            for t in range(n_vtiles):
                v = v_ref[:, pl.ds(t * v_tile, v_tile)]
                vsq = jnp.sum(v * v, axis=0, keepdims=True)
                qv = jax.lax.dot_general(
                    q, v, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d2 = vsq - 2.0 * qv
                # quantize: d2 in [-|q|^2, 1e12]; clamp to 2^17 range
                dq = jnp.minimum(d2 * 1024.0, 2.0**17 - 1).astype(jnp.int32)
                lane = jax.lax.broadcasted_iota(jnp.int32,
                                                (p_tile, v_tile), 1)
                key = dq * 8192 + lane + t * v_tile
                best = jnp.minimum(best,
                                   jnp.min(key, axis=1, keepdims=True))
            idx_ref[:] = best % 8192
            dist_ref[:] = (best // 8192).astype(jnp.float32) / 1024.0 \
                + jnp.sum(q * q, axis=1, keepdims=True)
            return
        def dist_tile(t):
            v = v_ref[:, pl.ds(t * v_tile, v_tile)]
            if mode == "vpu":
                # elementwise (q - v)^2 via broadcasts — no MXU at all
                d2 = jnp.zeros((p_tile, v_tile), jnp.float32)
                for c in range(3):
                    diff = q[:, c:c + 1] - v[c:c + 1, :]
                    d2 = d2 + diff * diff
                return d2 - jnp.sum(q * q, axis=1, keepdims=True)
            vsq = jnp.sum(v * v, axis=0, keepdims=True)
            qv = jax.lax.dot_general(
                q, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return vsq - 2.0 * qv

        best = jnp.full((p_tile, 1), jnp.inf, jnp.float32)
        best_i = jnp.zeros((p_tile, 1), jnp.int32)
        for t in range(n_vtiles):
            d2 = dist_tile(t)
            m = jnp.min(d2, axis=1, keepdims=True)
            if mode == "minonly":
                best = jnp.minimum(best, m)
            else:
                i = jnp.argmin(d2, axis=1, keepdims=True).astype(
                    jnp.int32) + t * v_tile
                upd = m < best
                best = jnp.where(upd, m, best)
                best_i = jnp.where(upd, i, best_i)
        if mode == "minonly":
            # second pass recomputes d2 (matmuls are cheap vs VPU argmin)
            lane = jax.lax.broadcasted_iota(jnp.int32, (p_tile, v_tile), 1)
            big = jnp.int32(2**30)
            cand = jnp.full((p_tile, 1), big)
            for t in range(n_vtiles):
                d2 = dist_tile(t)
                eq = jnp.where(d2 <= best, lane + t * v_tile, big)
                cand = jnp.minimum(cand, jnp.min(eq, axis=1, keepdims=True))
            best_i = cand
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
        dist_ref[:] = best + qsq
        idx_ref[:] = best_i

    def run(query, ref):
        n = query.shape[0]
        v = ref.shape[0]
        qt = jnp.pad(query.astype(jnp.float32), ((0, -n % p_tile), (0, 0)))
        vt = jnp.pad(ref.astype(jnp.float32), ((0, -v % v_tile), (0, 0)),
                     constant_values=SENTINEL).T
        n_tiles = qt.shape[0] // p_tile
        n_vtiles = vt.shape[1] // v_tile
        dist, idx = pl.pallas_call(
            functools.partial(kernel, n_vtiles=n_vtiles),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((p_tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, vt.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((p_tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p_tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qt.shape[0], 1), jnp.float32),
                jax.ShapeDtypeStruct((qt.shape[0], 1), jnp.int32),
            ],
        )(qt, vt)
        return dist[:n, 0], idx[:n, 0]

    return run


def main(N=524288):
    from sherf_tpu.kernels.knn_pallas import (nn_1_clustered_pallas,
                                              nn_1_pallas)
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    key = jax.random.PRNGKey(0)
    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = smpl_forward(smpl, jnp.asarray(bp["poses"]),
                           jnp.asarray(bp["shapes"]))[0]
    q = jax.random.uniform(key, (N, 3), minval=-1.2, maxval=1.2)
    v = jnp.asarray(t_verts)
    # production-like queries: voxel-prune survivors hug the body surface
    # (within ~2 voxels) and arrive in ray-major (spatially coherent) order
    rs = np.random.RandomState(0)
    vn = np.asarray(t_verts)
    qs = (vn[rs.randint(0, vn.shape[0], N)]
          + rs.randn(N, 3).astype(np.float32) * 0.05)
    qs = jnp.asarray(qs[np.argsort(qs[:, 0], kind="stable")])  # coherent

    base = jax.jit(lambda a, b: nn_1_pallas(a, b)[1])
    ref_idx = np.asarray(base(q, v))
    timeit(base, q, v, tag="production nn_1_pallas (1024x2048)")
    timeit(base, qs, v, tag="production nn_1_pallas (surface queries)")

    clus = jax.jit(lambda a, b: nn_1_clustered_pallas(a, b)[1])
    ci = np.asarray(clus(q, v))
    m = (ci == ref_idx).mean()
    timeit(clus, q, v, tag=f"clustered B&B (uniform queries, match {m:.4f})")
    ref_s = np.asarray(base(qs, v))
    cs = np.asarray(clus(qs, v))
    ms = (cs == ref_s).mean()
    timeit(clus, qs, v,
           tag=f"clustered B&B (surface queries, match {ms:.4f})")

    for p_tile, v_tile, mode in [
        (1024, 2048, "base"),
        (512, 2048, "base"),
        (1024, 1024, "base"),
        (1024, 2048, "minonly"),
        (1024, 2048, "packed"),
        (1024, 2048, "vpu"),
        (1024, 1024, "vpu"),
    ]:
        run = make_variant(p_tile, v_tile, mode)
        fn = jax.jit(lambda a, b, r=run: r(a, b)[1])
        try:
            idx = np.asarray(fn(q, v))
            match = (idx == ref_idx).mean()
            timeit(fn, q, v,
                   tag=f"P={p_tile} VT={v_tile} {mode} (match {match:.4f})")
        except Exception as e:  # noqa: BLE001
            print(f"P={p_tile} VT={v_tile} {mode}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
