"""grid_sample parity vs torch.nn.functional.grid_sample (zeros padding)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from sherf_tpu.kernels import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_2d(align_corners):
    rng = np.random.RandomState(0)
    H, W, C, N = 9, 13, 4, 500
    img = rng.randn(H, W, C).astype(np.float32)
    coords = (rng.rand(N, 2).astype(np.float32) * 2.6 - 1.3)  # incl. out of bounds

    ref = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(coords)[None, None],
        mode="bilinear", padding_mode="zeros", align_corners=align_corners,
    )[0, :, 0].T.numpy()

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords),
                                     align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_3d(align_corners):
    rng = np.random.RandomState(1)
    D, H, W, C, N = 5, 7, 9, 3, 400
    vol = rng.randn(D, H, W, C).astype(np.float32)
    coords = (rng.rand(N, 3).astype(np.float32) * 2.6 - 1.3)

    ref = F.grid_sample(
        torch.from_numpy(vol).permute(3, 0, 1, 2)[None],
        torch.from_numpy(coords)[None, None, None],
        mode="bilinear", padding_mode="zeros", align_corners=align_corners,
    )[0, :, 0, 0].T.numpy()

    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                                     align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
