"""Ray/AABB/projection golden tests vs the reference dataset helpers."""

import numpy as np
import jax.numpy as jnp

from sherf_tpu.geometry import (
    get_rays, get_rays_np, near_far_aabb, near_far_aabb_np, project_points,
    vertex_normals, backface_mask,
)
from conftest import add_reference_path


def _random_camera(rng):
    # a camera looking roughly at the origin from ~3m away
    import cv2
    rvec = rng.randn(3) * 0.3
    R, _ = cv2.Rodrigues(rvec)
    R = R.astype(np.float32)
    cam_pos = np.array([0.2, 0.1, 3.0], dtype=np.float32) + rng.randn(3).astype(np.float32) * 0.1
    T = (-R @ cam_pos).reshape(3, 1).astype(np.float32)
    K = np.array([[500.0, 0, 64], [0, 500.0, 64], [0, 0, 1]], dtype=np.float32)
    return K, R, T


def test_get_rays_matches_reference():
    add_reference_path()
    from training.THuman_dataset import get_rays as ref_get_rays

    rng = np.random.RandomState(0)
    K, R, T = _random_camera(rng)
    H = W = 32
    ref_o, ref_d = ref_get_rays(H, W, K, R, T)
    o, d = get_rays(H, W, jnp.asarray(K), jnp.asarray(R), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(o), ref_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d), ref_d, atol=1e-4)
    o2, d2 = get_rays_np(H, W, K, R, T)
    np.testing.assert_allclose(o2, ref_o, atol=1e-4)
    np.testing.assert_allclose(d2, ref_d, atol=1e-4)


def test_near_far_matches_reference():
    add_reference_path()
    from training.THuman_dataset import get_near_far as ref_get_near_far

    rng = np.random.RandomState(1)
    K, R, T = _random_camera(rng)
    H = W = 48
    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    bounds = np.array([[-0.4, -0.9, -0.3], [0.4, 0.6, 0.3]], dtype=np.float32)

    ref_near, ref_far, ref_mask = ref_get_near_far(bounds, ray_o.copy(), ray_d.copy())
    # expand to full-length arrays exactly like the loader (THuman_dataset.py:134-139)
    ref_near_all = np.zeros(ray_o.shape[0], np.float32)
    ref_far_all = np.ones(ray_o.shape[0], np.float32)
    ref_near_all[ref_mask] = ref_near
    ref_far_all[ref_mask] = ref_far

    near, far, mask = near_far_aabb(bounds, jnp.asarray(ray_o), jnp.asarray(ray_d))
    near, far, mask = np.asarray(near), np.asarray(far), np.asarray(mask)

    # Masks agree except possibly on degenerate tangent rays.
    assert (mask == ref_mask).mean() > 0.999
    both = mask & ref_mask
    np.testing.assert_allclose(near[both], ref_near_all[both], atol=1e-3)
    np.testing.assert_allclose(far[both], ref_far_all[both], atol=1e-3)

    nn, ff, mm = near_far_aabb_np(bounds, ray_o, ray_d)
    np.testing.assert_allclose(nn, near, atol=1e-5)
    np.testing.assert_allclose(ff, far, atol=1e-5)
    assert (mm == mask).all()


def test_project_points_roundtrip():
    rng = np.random.RandomState(2)
    K, R, T = _random_camera(rng)
    pts = rng.randn(100, 3).astype(np.float32) * 0.3
    xy, cam = project_points(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(R), jnp.asarray(T))
    # manual check for one point
    p = pts[0]
    c = R @ p + T[:, 0]
    uv = K @ c
    np.testing.assert_allclose(np.asarray(xy)[0], (uv[:2] / (uv[2] + 1e-5)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cam)[0], c, rtol=1e-5)


def test_vertex_normals_sphere():
    # Normals of an octahedron point outward.
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
                     dtype=np.float32)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], dtype=np.int32)
    n = np.asarray(vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))
    cos = (n * verts).sum(-1)
    assert (cos > 0.9).all()


def test_backface_mask_splits_sphere():
    rng = np.random.RandomState(3)
    K, R, T = _random_camera(rng)
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
                     dtype=np.float32) * 0.3
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], dtype=np.int32)
    m = np.asarray(backface_mask(jnp.asarray(verts), jnp.asarray(faces),
                                 jnp.asarray(K), jnp.asarray(R), jnp.asarray(T)))
    # some vertices face the camera, some don't
    assert m.any() and not m.all()
