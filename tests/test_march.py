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


@pytest.mark.parametrize("white_back", [False, True])
def test_segmented_march_matches_dense(white_back):
    """ray_march_segmented on a compacted point list == scatter back into the
    (N, D) grid with density -80 holes + dense ray_march (the reference
    composition semantics, renderer.py:364-371)."""
    import jax.numpy as jnp

    from sherf_tpu.nerf.march import ray_march, ray_march_segmented

    rng = np.random.RandomState(3)
    N, D, P = 37, 12, 128  # P slots, some invalid tail

    near = rng.rand(N).astype(np.float32) * 0.5 + 1.0
    far = near + rng.rand(N).astype(np.float32) * 2.0 + 0.5
    rays_d = rng.randn(N, 3).astype(np.float32)
    steps = np.linspace(0.0, 1.0, D, dtype=np.float32)
    depths = near[:, None] + (far - near)[:, None] * steps  # (N, D)

    # random ascending subset of the N*D grid as the "compacted" points
    count = 97
    flat = np.sort(rng.choice(N * D, size=count, replace=False))
    gidx = np.concatenate([flat, np.zeros(P - count, np.int64)])
    valid = np.arange(P) < count
    colors_p = rng.rand(P, 3).astype(np.float32)
    sigma_p = (rng.randn(P).astype(np.float32) * 2).clip(-3, 5)
    sigma_p[rng.rand(P) < 0.3] = -80.0  # interior masking via density

    # dense oracle
    colors_d = np.zeros((N * D, 3), np.float32)
    dens_d = np.full((N * D,), -80.0, np.float32)
    colors_d[flat] = colors_p[:count] * (sigma_p[:count, None] > -80.0)
    dens_d[flat] = sigma_p[:count]
    ref_rgb, ref_depth, ref_w = ray_march(
        jnp.asarray(colors_d.reshape(N, D, 3)),
        jnp.asarray(dens_d.reshape(N, D)),
        jnp.asarray(depths), jnp.asarray(rays_d), white_back=white_back)

    rgb, depth, acc = ray_march_segmented(
        jnp.asarray(colors_p), jnp.asarray(sigma_p), jnp.asarray(gidx),
        jnp.asarray(valid), jnp.asarray(near), jnp.asarray(far),
        jnp.asarray(rays_d), D, white_back=white_back)

    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc),
                               np.asarray(jnp.sum(ref_w, axis=-1)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               rtol=1e-4, atol=1e-4)
