"""Ray marcher parity vs reference MipRayMarcher2 (pure torch, CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from sherf_tpu.nerf import ray_march
from conftest import add_reference_path

add_reference_path()
from training.volumetric_rendering.ray_marcher import MipRayMarcher2  # noqa: E402


@pytest.mark.parametrize("clamp_mode,white_back", [
    ("relu", False), ("relu", True), ("softplus", False),
])
def test_ray_march_matches_reference(clamp_mode, white_back):
    rng = np.random.RandomState(0)
    B, N, D = 1, 64, 12
    colors = rng.rand(B, N, D, 3).astype(np.float32)
    # mix of inside (-80) and positive densities like the real renderer
    dens = rng.randn(B, N, D, 1).astype(np.float32) * 5
    dens[rng.rand(B, N, D, 1) < 0.5] = -80.0
    depths = np.sort(rng.rand(B, N, D, 1).astype(np.float32) * 2 + 2, axis=2)
    rays_d = rng.randn(B, N, 3).astype(np.float32)

    marcher = MipRayMarcher2()
    opts = {"clamp_mode": clamp_mode, "white_back": white_back}
    ref_rgb, ref_depth, ref_w = marcher(
        torch.from_numpy(colors), torch.from_numpy(dens),
        torch.from_numpy(depths), torch.from_numpy(rays_d), opts)

    rgb, depth, w = ray_march(
        jnp.asarray(colors[0]), jnp.asarray(dens[0, ..., 0]),
        jnp.asarray(depths[0, ..., 0]), jnp.asarray(rays_d[0]),
        clamp_mode=clamp_mode, white_back=white_back)

    np.testing.assert_allclose(np.asarray(rgb), ref_rgb[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), ref_w[0, ..., 0].numpy(), atol=1e-5)
    # reference depth keeps a trailing dim; compare where acc is meaningful
    np.testing.assert_allclose(np.asarray(depth), ref_depth[0, :, 0].numpy(),
                               atol=1e-4)
