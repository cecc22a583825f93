from sherf_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, interleave_rays, uninterleave_rays,
)
from sherf_tpu.parallel.render import make_sharded_render

__all__ = ["make_mesh", "shard_batch", "replicate", "interleave_rays",
           "uninterleave_rays", "make_sharded_render"]
