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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sherf_tpu.core.types import SHERFBatch


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """shape = (data, rays); defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "rays"))


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


def shard_batch(batch: SHERFBatch, mesh: Mesh) -> SHERFBatch:
    specs = batch_pspecs(batch)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), batch, specs)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
