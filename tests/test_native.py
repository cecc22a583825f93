"""Native C++ host ops vs the NumPy reference paths."""

import numpy as np
import pytest

from sherf_tpu.native import (
    lib, prepare_rays_native, fill_convex_poly_native,
)
from sherf_tpu.geometry import get_rays_np, near_far_aabb_np


@pytest.fixture(scope="module")
def have_lib():
    if lib() is None:
        pytest.skip("native toolchain unavailable")


def test_prepare_rays_matches_numpy(have_lib):
    import cv2

    rng = np.random.RandomState(0)
    rvec = rng.randn(3) * 0.4
    R, _ = cv2.Rodrigues(rvec)
    R = R.astype(np.float32)
    cam = np.array([0.3, -0.2, 3.0], np.float32)
    T = (-R @ cam).reshape(3, 1)
    K = np.array([[400.0, 0, 32], [0, 400.0, 32], [0, 0, 1]], np.float32)
    H = W = 64
    bounds = np.array([[-0.5, -1.0, -0.3], [0.5, 0.8, 0.3]], np.float32)

    out = prepare_rays_native(H, W, K, R, T, bounds)
    assert out is not None
    ro, rd, near, far, mask = out

    ro_ref, rd_ref = get_rays_np(H, W, K, R, T)
    np.testing.assert_allclose(ro, ro_ref.reshape(-1, 3), atol=1e-4)
    np.testing.assert_allclose(rd, rd_ref.reshape(-1, 3), atol=1e-4)
    n_ref, f_ref, m_ref = near_far_aabb_np(bounds, ro_ref.reshape(-1, 3),
                                           rd_ref.reshape(-1, 3))
    assert (mask == m_ref).mean() > 0.999
    both = mask & m_ref
    np.testing.assert_allclose(near[both], n_ref[both], atol=1e-3)
    np.testing.assert_allclose(far[both], f_ref[both], atol=1e-3)


def test_fill_convex_poly_matches_cv2(have_lib):
    import cv2

    rng = np.random.RandomState(1)
    H = W = 64
    for _ in range(5):
        # random convex quad (sorted by angle around centroid)
        pts = rng.randint(5, 60, size=(4, 2)).astype(np.int32)
        c = pts.mean(0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        pts = pts[np.argsort(ang)]
        loop = np.concatenate([pts, pts[:1]], 0)

        ref = np.zeros((H, W), np.uint8)
        cv2.fillPoly(ref, [loop], 1)
        ours = np.zeros((H, W), np.uint8)
        assert fill_convex_poly_native(ours, loop)
        # rasterization rounding differs at edges by at most a 1px band
        diff = (ours != ref)
        assert diff.mean() < 0.05
        interior = cv2.erode(ref, np.ones((3, 3), np.uint8))
        assert (ours[interior > 0] == 1).all()


def test_dataset_pipeline_uses_native(have_lib):
    # sample_rays_for_image goes through the native path and stays correct
    from sherf_tpu.data import sample_rays_for_image

    rng = np.random.RandomState(2)
    H = W = 48
    img = rng.rand(H, W, 3).astype(np.float32)
    msk = (rng.rand(H, W) > 0.5).astype(np.float32)
    K = np.array([[300.0, 0, 24], [0, 300.0, 24], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.array([[0.0], [0.0], [3.0]], np.float32)
    bounds = np.array([[-0.4, -0.6, -0.3], [0.4, 0.6, 0.3]], np.float32)
    out_img, ro, rd, near, far, mask, bk = sample_rays_for_image(
        img, msk, K, R, T, bounds)
    assert ro.shape == (H * W, 3)
    assert mask.any()
    assert (far[mask] > near[mask]).all()
