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


def test_packed_2d_matches_four_tap():
    import numpy as np
    import jax.numpy as jnp
    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d, grid_sample_2d_packed, pack_corners_2d)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(19, 23, 7).astype(np.float32))
    packed = pack_corners_2d(img)
    assert packed.shape == (19, 23, 28)
    # includes far out-of-bounds, exact-edge and interior coords
    coords = jnp.asarray(np.concatenate([
        rng.uniform(-1.3, 1.3, (4000, 2)),
        [[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [0.0, 0.0], [2.0, 0.0]],
    ]).astype(np.float32))
    for ac in (False, True):
        a = np.asarray(grid_sample_2d(img, coords, align_corners=ac))
        b = np.asarray(grid_sample_2d_packed(packed, coords,
                                             align_corners=ac))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_packed_trilinear_matches_ref():
    import numpy as np
    import jax.numpy as jnp
    from sherf_tpu.features.sparseconv import (
        trilinear_dense_sample, trilinear_dense_sample_packed)

    rng = np.random.RandomState(1)
    S, C = 300, 5
    shape = (12, 14, 16)
    coords = jnp.asarray(np.stack([
        rng.randint(0, shape[i], S) for i in range(3)], -1).astype(np.int32))
    feats = jnp.asarray(rng.randn(S, C).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=S) < 0.9)
    pos = jnp.asarray(np.concatenate([
        rng.uniform(-1.5, np.asarray(shape) + 0.5, (3000, 3)),
        [[0.0, 0.0, 0.0], [11.0, 13.0, 15.0], [-0.4, 2.2, 3.7]],
    ]).astype(np.float32))
    a = np.asarray(trilinear_dense_sample_packed(feats, coords, valid, shape, pos))
    b = np.asarray(trilinear_dense_sample(feats, coords, valid, shape, pos))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_xpacked_2d_matches_four_tap():
    """x-only corner packing (the production fast path: 2 row gathers per
    bilinear sample, rows stay narrow) is bit-compatible with the 4-tap
    reference formulation."""
    import numpy as np
    import jax.numpy as jnp
    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d, grid_sample_2d_xpacked, pack_x_2d)

    rng = np.random.RandomState(3)
    for dt in (jnp.float32, jnp.bfloat16):
        img = jnp.asarray(rng.randn(19, 23, 7).astype(np.float32), dt)
        packed = pack_x_2d(img)
        assert packed.shape == (19, 23, 14)
        coords = jnp.asarray(np.concatenate([
            rng.uniform(-1.3, 1.3, (4000, 2)),
            [[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [0.0, 0.0], [2.0, 0.0]],
        ]).astype(np.float32))
        for ac in (False, True):
            a = np.asarray(grid_sample_2d(img, coords, align_corners=ac))
            b = np.asarray(grid_sample_2d_xpacked(packed, coords,
                                                  align_corners=ac))
            assert (a == b).all(), f"dt={dt} ac={ac}"


def test_xpacked_wg_matches_plain_and_table_grad():
    """The weighted-gather form of the x-packed sampler (train path: the
    obs-feature table gets the multi-hot MXU adjoint instead of XLA's
    scatter-add) matches the plain form in the forward, and its table
    gradient matches the plain form's autodiff gradient."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sherf_tpu.kernels.grid_sample import (
        grid_sample_2d_xpacked, grid_sample_2d_xpacked_wg, pack_x_2d)

    rng = np.random.RandomState(9)
    img = jnp.asarray(rng.randn(17, 21, 6).astype(np.float32))
    coords = jnp.asarray(np.concatenate([
        rng.uniform(-1.3, 1.3, (500, 2)),
        [[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [0.0, 0.0], [2.0, 0.0]],
    ]).astype(np.float32))
    for ac in (False, True):
        a = np.asarray(grid_sample_2d_xpacked(pack_x_2d(img), coords,
                                              align_corners=ac))
        b = np.asarray(grid_sample_2d_xpacked_wg(pack_x_2d(img), coords,
                                                 align_corners=ac))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

        def loss_plain(im):
            out = grid_sample_2d_xpacked(pack_x_2d(im), coords,
                                         align_corners=ac)
            return jnp.sum(out * out)

        def loss_wg(im):
            out = grid_sample_2d_xpacked_wg(pack_x_2d(im), coords,
                                            align_corners=ac)
            return jnp.sum(out * out)

        ga = np.asarray(jax.grad(loss_plain)(img))
        gb = np.asarray(jax.grad(loss_wg)(img))
        # the multi-hot adjoint rounds weights/grads to bf16 by declared
        # precision; compare at that tolerance
        np.testing.assert_allclose(ga, gb, rtol=2e-2, atol=2e-2)


def test_xpacked_trilinear_matches_ref():
    """4-row-gather x-packed trilinear readout (production 3D bank path)
    is bit-identical to the 8-gather dense formulation."""
    import numpy as np
    import jax.numpy as jnp
    from sherf_tpu.features.sparseconv import (
        trilinear_dense_sample, trilinear_dense_sample_x)

    rng = np.random.RandomState(4)
    S, C = 300, 5
    shape = (12, 14, 16)
    coords = jnp.asarray(np.stack([
        rng.randint(0, shape[i], S) for i in range(3)], -1).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=S) < 0.9)
    pos = jnp.asarray(np.concatenate([
        rng.uniform(-1.5, np.asarray(shape) + 0.5, (3000, 3)),
        [[0.0, 0.0, 0.0], [11.0, 13.0, 15.0], [-0.4, 2.2, 3.7]],
    ]).astype(np.float32))
    for dt in (jnp.float32, jnp.bfloat16):
        feats = jnp.asarray(rng.randn(S, C).astype(np.float32), dt)
        a = np.asarray(trilinear_dense_sample(feats, coords, valid, shape, pos))
        b = np.asarray(trilinear_dense_sample_x(feats, coords, valid, shape, pos))
        assert (a == b).all(), f"dt={dt}"


def test_site_sample_packed_matches_ref():
    """Corner-packed index-grid readout (production 3D bank path) matches
    the 8-lookup site sampler."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sherf_tpu.features.sparseconv import (
        build_index_grid, trilinear_site_sample, trilinear_site_sample_packed)

    shape = (9, 11, 13)
    S = 60
    rs = np.random.RandomState(5)
    coords = jnp.asarray(np.stack(
        [rs.randint(0, s, S) for s in shape], -1).astype(np.int32))
    valid = jnp.arange(S) < 50
    grid = build_index_grid(coords, valid, shape)
    pos = jnp.asarray(np.concatenate([
        rs.uniform(-1.5, 14.0, (3000, 3)),
        [[0, 0, 0], [8, 10, 12], [-0.4, 2.2, 3.7]],
    ]).astype(np.float32))
    for dt in (jnp.float32, jnp.bfloat16):
        feats = jax.random.normal(jax.random.PRNGKey(1), (S, 5), dt)
        a = np.asarray(trilinear_site_sample(feats, grid, shape, pos))
        b = np.asarray(trilinear_site_sample_packed(feats, grid, shape, pos))
        np.testing.assert_allclose(a, b, atol=1e-5)
