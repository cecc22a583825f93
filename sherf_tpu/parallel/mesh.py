"""Device mesh construction + sharding rules.

The reference scales only by data parallelism (one torch process per GPU,
NCCL all_reduce — train.py:32-52, training_loop.py:374-384).  Here the mesh
has two axes:

  data  — batch sharding (classic DP)
  rays  — shards the ray dimension *within* each sample, the natural
          "sequence parallel" axis of volumetric rendering (each sample is
          H*W rays x D depth samples; rays are embarrassingly parallel
          until the final image gather)

With params replicated and inputs annotated, XLA SPMD inserts the gradient
psum over ICI; no explicit collectives are needed in model code.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sherf_tpu.core.types import SHERFBatch


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """shape = (data, rays); defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] <= n, f"mesh {shape} > {n} devices"
    arr = np.asarray(devices[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, ("data", "rays"))


def auto_mesh(batch_size: int, n_rays: int, devices=None) -> Mesh:
    """Largest (data, rays) mesh whose axes divide the batch and ray dims
    (required by the shard_map train/render steps), preferring the data
    axis.  May use fewer than all devices if the shapes don't factor."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    best = (1, 1)
    for dm in range(1, n + 1):
        if batch_size % dm:
            continue
        rm = n // dm
        while rm > 1 and n_rays % rm:
            rm -= 1
        if dm * rm > best[0] * best[1] or (
                dm * rm == best[0] * best[1] and dm > best[0]):
            best = (dm, rm)
    return make_mesh(best, devices=devices)


# Per-field partition specs for a SHERFBatch: batch dim on 'data'; the ray
# dimension (axis 1 of the ray tensors) on 'rays'.
_RAY_FIELDS = {"ray_o": P("data", "rays", None), "ray_d": P("data", "rays", None),
               "near": P("data", "rays"), "far": P("data", "rays"),
               "mask_at_box": P("data", "rays"), "bkgd_msk": P("data", "rays")}


def batch_pspecs(batch: SHERFBatch):
    def spec_for(path, leaf):
        name = path[-1].name if hasattr(path[-1], "name") else str(path[-1])
        if name in _RAY_FIELDS:
            return _RAY_FIELDS[name]
        return P("data")

    return jax.tree_util.tree_map_with_path(spec_for, batch)


def shard_batch(batch: SHERFBatch, mesh: Mesh,
                interleave: bool = False) -> SHERFBatch:
    """Device-put a batch with the standard specs.

    ``interleave=True`` round-robins the ray dimension across the 'rays'
    axis first (see :func:`interleave_rays`) so each ray shard sees an even
    spatial slice of the image — required by the shard_map train/render
    steps, whose static point budgets are per-shard (contiguous row-block
    shards would concentrate the body's samples in a few shards and
    overflow their budgets)."""
    rm = mesh.shape["rays"]
    if interleave and rm > 1:
        batch = interleave_rays(batch, rm)
    specs = batch_pspecs(batch)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), batch, specs)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


# ---------------------------------------------------------------------------
# ray-dimension interleaving (round-robin across the 'rays' mesh axis)


def _interleave(x, rm: int):
    """(B, N, ...) -> same shape; element [b, k*(N//rm) + j] = x[b, j*rm + k]
    so a contiguous 'rays' sharding assigns ray i to shard i % rm."""
    B, N = x.shape[:2]
    assert N % rm == 0, (N, rm)
    return jnp.swapaxes(x.reshape(B, N // rm, rm, *x.shape[2:]), 1, 2
                        ).reshape(x.shape)


def uninterleave_rays(x, rm: int):
    """Inverse of :func:`_interleave` — also the re-assembly of a tiled
    all_gather over 'rays' (shard-major concat) back to original ray order."""
    if rm == 1:
        return x
    B, N = x.shape[:2]
    return jnp.swapaxes(x.reshape(B, rm, N // rm, *x.shape[2:]), 1, 2
                        ).reshape(x.shape)


_RAY_AXIS_FIELDS = ("ray_o", "ray_d", "near", "far", "mask_at_box",
                    "bkgd_msk")


def interleave_rays(batch: SHERFBatch, rm: int) -> SHERFBatch:
    if rm == 1:
        return batch
    return batch.replace(**{f: _interleave(getattr(batch, f), rm)
                            for f in _RAY_AXIS_FIELDS})
