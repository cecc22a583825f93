from sherf_tpu.geometry.shape import (
    convert_sdf_samples_to_ply,
    marching_tetrahedra,
    read_mrc,
    read_ply,
    write_mrc,
    write_ply,
)
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
    "convert_sdf_samples_to_ply",
    "marching_tetrahedra",
    "read_mrc",
    "read_ply",
    "write_mrc",
    "write_ply",
    "get_rays",
    "get_rays_np",
    "near_far_aabb",
    "near_far_aabb_np",
    "project_points",
    "vertex_normals",
    "backface_mask",
]
