"""Camera rays, AABB intersection, projection and mesh normals.

Re-derivations of the reference's per-dataset helpers (get_rays /
get_near_far in THuman_dataset.py:13-102 and friends — identical across the
four loaders) and the projection/backface utilities (renderer.py:50-63,
686-704).  jnp versions are static-shape: no boolean indexing; invalid rays
get (near, far) = (0, 1) exactly like the loaders' post-processing
(THuman_dataset.py:134-139).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Rays


def get_rays(H: int, W: int, K, R, T):
    """World-space rays through every pixel (reference get_rays,
    THuman_dataset.py:13-26).

    K: (3,3) intrinsics; R: (3,3), T: (3,1) world->cam.  Returns
    (rays_o, rays_d) each (H, W, 3); directions are NOT normalized.
    """
    T = jnp.reshape(T, (3,))
    rays_o = -R.T @ T  # camera center in world
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    xy1 = jnp.stack([i, j, jnp.ones_like(i)], axis=-1)  # (H, W, 3)
    pixel_camera = xy1 @ jnp.linalg.inv(K).T
    pixel_world = (pixel_camera - T) @ R
    rays_d = pixel_world - rays_o
    rays_o = jnp.broadcast_to(rays_o, rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, R, T):
    """NumPy twin of :func:`get_rays` for the host data pipeline."""
    T = np.reshape(T, (3,))
    rays_o = -R.T @ T
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    xy1 = np.stack([i, j, np.ones_like(i)], axis=-1)
    pixel_camera = xy1 @ np.linalg.inv(K).T.astype(np.float32)
    pixel_world = (pixel_camera - T) @ R
    rays_d = (pixel_world - rays_o).astype(np.float32)
    rays_o = np.broadcast_to(rays_o.astype(np.float32), rays_d.shape)
    return rays_o, rays_d


# ---------------------------------------------------------------------------
# AABB near/far


def near_far_aabb(bounds, ray_o, ray_d, margin: float = 0.01):
    """Slab-method ray/AABB intersection with the reference's conventions
    (get_near_far, THuman_dataset.py:67-102): bounds are padded by
    ``margin``, distances are measured in units of the unnormalized ray
    direction, and rays that miss get (near, far) = (0, 1).

    bounds: (2, 3); ray_o, ray_d: (..., 3).
    Returns (near, far, mask) with shapes (...,).
    """
    lo = bounds[0] - margin
    hi = bounds[1] + margin
    d = jnp.where(ray_d == 0.0, 1e-8, ray_d)
    t0 = (lo - ray_o) / d
    t1 = (hi - ray_o) / d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    mask = tmax > tmin
    # |t| matches the reference's norm-based distances (cameras sit outside
    # the box, so t>0 in practice; abs covers the degenerate inside case).
    near = jnp.minimum(jnp.abs(tmin), jnp.abs(tmax))
    far = jnp.maximum(jnp.abs(tmin), jnp.abs(tmax))
    near = jnp.where(mask, near, 0.0)
    far = jnp.where(mask, far, 1.0)
    return near.astype(jnp.float32), far.astype(jnp.float32), mask


def near_far_aabb_np(bounds, ray_o, ray_d, margin: float = 0.01):
    """NumPy twin of :func:`near_far_aabb` for the host pipeline."""
    lo = bounds[0] - margin
    hi = bounds[1] + margin
    d = np.where(ray_d == 0.0, 1e-8, ray_d)
    t0 = (lo - ray_o) / d
    t1 = (hi - ray_o) / d
    tmin = np.max(np.minimum(t0, t1), axis=-1)
    tmax = np.min(np.maximum(t0, t1), axis=-1)
    mask = tmax > tmin
    near = np.where(mask, np.minimum(np.abs(tmin), np.abs(tmax)), 0.0)
    far = np.where(mask, np.maximum(np.abs(tmin), np.abs(tmax)), 1.0)
    return near.astype(np.float32), far.astype(np.float32), mask


# ---------------------------------------------------------------------------
# Projection & normals


def project_points(pts, K, R, T, eps: float = 1e-5):
    """World points -> pixel coordinates (reference renderer.projection,
    renderer.py:686-704, single view).

    pts: (N, 3); K, R: (3, 3); T: (3, 1).  Returns (xy (N, 2), cam_xyz (N, 3)).

    Full-f32 matmuls: the TPU default (~bf16 mantissa) shifted projected
    UVs by whole texels of the 2D feature bank.
    """
    import jax

    with jax.default_matmul_precision("float32"):
        cam = pts @ R.T + jnp.reshape(T, (1, 3))
        pix = cam @ K.T
    xy = pix[..., :2] / (pix[..., 2:3] + eps)
    return xy, cam


def vertex_normals(verts, faces, eps: float = 1e-8):
    """Area-ignoring vertex normals: normalized face normals scatter-added to
    their corners, then renormalized (reference compute_normal,
    renderer.py:50-63; we use a true scatter-add where torch's advanced
    indexing silently dropped duplicate contributions).

    verts: (V, 3); faces: (F, 3) int.  Returns (V, 3).
    """
    tris = verts[faces]  # (F, 3, 3)
    n = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)
    out = jnp.zeros_like(verts)
    for k in range(3):
        out = out.at[faces[:, k]].add(n)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), eps)


def backface_mask(verts, faces, K, R, T):
    """True for vertices facing the camera (normal . view_dir < 0), the
    visibility gate on observation vertex features (renderer.py:691-695,
    triplane.py:126)."""
    _, cam = project_points(verts, K, R, T)
    n = vertex_normals(verts, faces)
    n_cam = n @ R.T
    return jnp.sum(n_cam * cam, axis=-1) < 0
