"""Pin down the TPU gather cost law to steer the texture-lookup design.

Questions answered (measured on the real chip):
  1. raw row-gather cost vs row width (4..1024 ch bf16);
  2. do independent gather ops overlap, or serialize (2 ops on 2 tables
     vs 1 op at 2x rows);
  3. does index locality (sorted / ray-coherent indices) beat random;
  4. x-only corner packing (rows stay <=128B) vs 4-tap bilinear vs the
     full 4-corner pack (512B rows).

Run: python tools/profile_gather_law.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


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


def main(N=524288, T=65536):
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    idx_rand = jax.random.randint(key, (N,), 0, T)
    idx_sort = jnp.sort(idx_rand)
    # ray-coherent: mostly-sequential with small strides (compaction order)
    idx_coh = (jnp.arange(N) // 8 * 11) % T

    # 1. width law
    for C in (4, 16, 32, 64, 128, 256, 512):
        tbl = jax.random.normal(key, (T, C), dt)
        timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tbl, idx_rand,
               tag=f"row gather 524k random  C={C:4d} ({2 * C}B)")

    # 2. op overlap: two half-size gathers on two tables vs one full
    tblA = jax.random.normal(key, (T, 64), dt)
    tblB = jax.random.normal(key, (T, 64), dt)
    half = N // 2
    timeit(jax.jit(lambda a, b, i: (jnp.take(a, i[:half], axis=0),
                                    jnp.take(b, i[half:], axis=0))),
           tblA, tblB, idx_rand, tag="2 ops x 262k rows C=64 (overlap?)")
    timeit(jax.jit(lambda a, i: jnp.take(a, i, axis=0)), tblA, idx_rand,
           tag="1 op x 524k rows C=64")

    # 3. locality
    tbl = jax.random.normal(key, (T, 64), dt)
    timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tbl, idx_sort,
           tag="row gather 524k SORTED  C=64")
    timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tbl, idx_coh,
           tag="row gather 524k COHERENT C=64")

    # 4. bilinear variants on a 256x256x32 plane
    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d, grid_sample_2d_packed, pack_corners_2d)
    plane = jax.random.normal(key, (256, 256, 32), dt)
    uv = jax.random.uniform(key, (N, 2), minval=-1, maxval=1)
    timeit(jax.jit(lambda im, c: grid_sample_2d(im, c)), plane, uv,
           tag="bilinear 32ch: 4-tap")
    packed = jax.jit(pack_corners_2d)(plane)
    timeit(jax.jit(lambda p, c: grid_sample_2d_packed(p, c)), packed, uv,
           tag="bilinear 32ch: full-pack 1-tap (256B rows)")
    try:
        from sherf_tpu.kernels.grid_sample import (
            grid_sample_2d_xpacked, pack_x_2d)
        xp = jax.jit(pack_x_2d)(plane)
        timeit(jax.jit(lambda p, c: grid_sample_2d_xpacked(p, c)), xp, uv,
               tag="bilinear 32ch: x-pack 2-tap (128B rows)")
    except ImportError:
        print("x-pack variant not built yet", flush=True)


if __name__ == "__main__":
    main()
