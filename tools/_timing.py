"""Amortized on-device timing for micro-benchmarks.

Single-dispatch timings on the axon platform carry a ~40ms host round-trip
floor (dispatch + scalar readback through the tunnel), which swamps any
kernel under ~50ms.  ``time_op`` instead times jit(op applied `reps` times
with a serializing scalar carry) at two rep counts and reports the slope —
pure on-device cost per application, overhead cancelled.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def _chained(fn, reps):
    @jax.jit
    def run(*args):
        def body(c, _):
            # serialize: perturb the first float leaf by c * 0
            leaves, treedef = jax.tree_util.tree_flatten(args)
            for i, leaf in enumerate(leaves):
                if hasattr(leaf, "dtype") and jnp.issubdtype(
                        leaf.dtype, jnp.floating):
                    leaves = list(leaves)
                    leaves[i] = leaf + c.astype(leaf.dtype) * 0
                    break
            out = fn(*jax.tree_util.tree_unflatten(treedef, leaves))
            first = jax.tree_util.tree_leaves(out)[0]
            c2 = first.ravel()[0].astype(jnp.float32)
            return c2, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c
    return run

def _wall(run, args, iters):
    out = run(*args)
    np.asarray(out)  # warm + force
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(run(*args))
    return (time.perf_counter() - t0) / iters


def time_op(fn, *args, reps=16, iters=3, tag=""):
    """Per-application cost of ``fn(*args)`` in ms, overhead-cancelled."""
    t_hi = _wall(_chained(fn, reps), args, iters)
    t_lo = _wall(_chained(fn, 1), args, iters)
    ms = (t_hi - t_lo) / (reps - 1) * 1e3
    if tag:
        print(f"{tag:52s}: {ms:8.2f} ms", flush=True)
    return ms
