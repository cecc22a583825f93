from sherf_tpu.nerf.march import ray_march
from sherf_tpu.nerf.warp import (
    PoseContext,
    make_pose_context,
    deform_target2c,
    deform_c2source,
)
from sherf_tpu.nerf.decoders import NeRFDecoder, OSGDecoder
from sherf_tpu.nerf.importance import sample_pdf, sample_importance
from sherf_tpu.nerf.renderer import SHERFRenderer, sample_from_planes

__all__ = [
    "ray_march",
    "PoseContext",
    "make_pose_context",
    "deform_target2c",
    "deform_c2source",
    "NeRFDecoder",
    "OSGDecoder",
    "sample_pdf",
    "sample_importance",
    "SHERFRenderer",
    "sample_from_planes",
]
