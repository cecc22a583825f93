"""Multi-chip rendering: shard_map the generator forward over (data, rays).

The eval/render analogue of train.step.make_sharded_train_step — each device
renders its local (B/dm, N/rm) ray shard (the model's per-batch-item loops
stay local, no GSPMD guesswork), then one tiled all_gather over 'rays'
re-assembles each image.  The reference scales rendering only by chunking on
one GPU (renderer.py:356); this shards the ray dimension across chips.

Use with a batch prepared by ``shard_batch(batch, mesh, interleave=True)``
(round-robin ray order keeps per-shard point budgets balanced).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from sherf_tpu.core.types import SHERFBatch
from sherf_tpu.parallel.mesh import batch_pspecs, uninterleave_rays
from sherf_tpu.smpl.model import SMPLModel


def make_sharded_render(model, smpl: SMPLModel, mesh):
    """Returns jitted (variables, batch) -> {image_raw, image_depth,
    weights_image} with full images, batch-sharded over 'data'."""
    rm = mesh.shape["rays"]

    def local_fwd(variables, batch: SHERFBatch):
        out = model.apply(variables, batch, smpl, flat_output=True)

        def gather(x):
            full = jax.lax.all_gather(x, "rays", axis=1, tiled=True)
            return uninterleave_rays(full, rm)

        B, H, W = batch.img.shape[:3]
        return {
            "image_raw": gather(out["image_raw"]).reshape(B, H, W, 3),
            "image_depth": gather(out["image_depth"]).reshape(B, H, W),
            "weights_image": gather(out["weights_image"]).reshape(B, H, W),
        }

    out_specs = {"image_raw": P("data"), "image_depth": P("data"),
                 "weights_image": P("data")}

    def render(variables, batch: SHERFBatch):
        specs = batch_pspecs(batch)
        fn = jax.shard_map(local_fwd, mesh=mesh, in_specs=(P(), specs),
                           out_specs=out_specs, check_vma=False)
        return fn(variables, batch)

    return jax.jit(render)
