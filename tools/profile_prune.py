"""Micro-profile of the prune/compaction pipeline pieces on TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    M = 512 * 512 * 48
    cap = 524288
    G = 224
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (M, 3), minval=-1.2, maxval=1.2)
    verts = jax.random.uniform(key, (6890, 3), minval=-1.0, maxval=1.0)

    # 1. voxel index + gather only
    def gather_only(p, occ_flat):
        lo = jnp.asarray([-1.4, -1.4, -1.4])
        qidx = jnp.floor((p - lo) / 0.0125).astype(jnp.int32)
        inb = jnp.all((qidx >= 0) & (qidx < G), axis=-1)
        qflat = jnp.clip((qidx[:, 0] * G + qidx[:, 1]) * G + qidx[:, 2],
                         0, G * G * G - 1)
        return (occ_flat[qflat] > 0) & inb

    occ_flat = jnp.zeros((G * G * G,), jnp.int8).at[
        jax.random.randint(key, (60000,), 0, G * G * G)].set(1)
    print(f"gather 12.6M from 11M grid : {timeit(jax.jit(gather_only), pts, occ_flat):7.1f} ms")

    # 2. scatter 6890 verts
    def scatter_only(v):
        lo = jnp.min(v, axis=0) - 0.075
        vidx = jnp.floor((v - lo) / 0.0125).astype(jnp.int32)
        flat = (vidx[:, 0] * G + vidx[:, 1]) * G + vidx[:, 2]
        return jnp.zeros((G * G * G,), jnp.int8).at[flat].set(1, mode="drop")
    print(f"scatter 6890               : {timeit(jax.jit(scatter_only), verts):7.1f} ms")

    # 3. dilation via reduce_window int8 vs conv vs bool
    occ3 = occ_flat.reshape(G, G, G)
    def dil_rw(o):
        for dims in ((11, 1, 1), (1, 11, 1), (1, 1, 11)):
            o = lax.reduce_window(o, jnp.int8(0), lax.max, dims, (1, 1, 1), "SAME")
        return o
    print(f"dilate reduce_window int8  : {timeit(jax.jit(dil_rw), occ3):7.1f} ms")

    def dil_rw_f32(o):
        o = o.astype(jnp.float32)
        for dims in ((11, 1, 1), (1, 11, 1), (1, 1, 11)):
            o = lax.reduce_window(o, 0.0, lax.max, dims, (1, 1, 1), "SAME")
        return o
    print(f"dilate reduce_window f32   : {timeit(jax.jit(dil_rw_f32), occ3):7.1f} ms")

    def dil_conv(o):
        x = o.astype(jnp.bfloat16).reshape(1, G, G, G, 1)
        for i, dims in enumerate(((11, 1, 1), (1, 11, 1), (1, 1, 11))):
            k = jnp.ones(dims + (1, 1), jnp.bfloat16)
            x = lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return (x > 0).reshape(G, G, G)
    print(f"dilate conv bf16           : {timeit(jax.jit(dil_conv), occ3):7.1f} ms")

    # 4. cumsum + compaction pieces
    mask = gather_only(pts, occ_flat)
    mask = jax.jit(lambda m: m)(mask)

    def cumsum_only(m):
        return jnp.cumsum(m)
    print(f"cumsum 12.6M               : {timeit(jax.jit(cumsum_only), mask):7.1f} ms")

    def compact(m):
        pos = jnp.cumsum(m) - 1
        slot = jnp.where(m & (pos < cap), pos, cap)
        idx = jnp.full((cap,), M, jnp.int32).at[slot].set(
            jnp.arange(M, dtype=jnp.int32), mode="drop")
        return idx
    print(f"full compaction            : {timeit(jax.jit(compact), mask):7.1f} ms")

    def scatter_big(m):
        pos = jnp.cumsum(m) - 1
        slot = jnp.where(m & (pos < cap), pos, cap)
        return jnp.full((cap,), M, jnp.int32).at[slot].set(
            jnp.arange(M, dtype=jnp.int32), mode="drop")
    # gather-based alternative: argsort? too slow probably; try int32 cumsum
    def compact_i32(m):
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        slot = jnp.where(m & (pos < cap), pos, cap)
        return jnp.full((cap,), M, jnp.int32).at[slot].set(
            jnp.arange(M, dtype=jnp.int32), mode="drop")
    print(f"compaction int32 cumsum    : {timeit(jax.jit(compact_i32), mask):7.1f} ms")


if __name__ == "__main__":
    main()
