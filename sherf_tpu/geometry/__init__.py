from sherf_tpu.geometry.rays import (
    get_rays,
    get_rays_np,
    near_far_aabb,
    near_far_aabb_np,
    project_points,
    vertex_normals,
    backface_mask,
)

__all__ = [
    "get_rays",
    "get_rays_np",
    "near_far_aabb",
    "near_far_aabb_np",
    "project_points",
    "vertex_normals",
    "backface_mask",
]
