"""Sparse voxel conv vs dense torch conv3d oracles — validates that the
site-list implementation reproduces spconv semantics exactly (submanifold
masking, stride-2 site dilation, trilinear dense readout)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sherf_tpu.features.sparseconv import (
    build_index_grid, subm_conv3d, stride_conv3d, downsample_sites,
    trilinear_site_sample, SparseConvNet, prepare_voxel_volume,
    voxelize_coords, world_to_voxel_f,
)


# model-level suite: excluded from the smoke tier (pytest.ini)
pytestmark = pytest.mark.heavy

def _random_sites(rng, n, shape):
    # unique random voxel coords
    total = shape[0] * shape[1] * shape[2]
    flat = rng.choice(total, size=n, replace=False)
    d = flat // (shape[1] * shape[2])
    h = (flat // shape[2]) % shape[1]
    w = flat % shape[2]
    return np.stack([d, h, w], -1).astype(np.int32)


def _densify(feats, coords, shape):
    dense = np.zeros((feats.shape[1], *shape), np.float32)
    dense[:, coords[:, 0], coords[:, 1], coords[:, 2]] = feats.T
    return dense


def test_subm_conv_matches_dense_masked_conv():
    rng = np.random.RandomState(0)
    shape = (10, 12, 14)
    coords = _random_sites(rng, 80, shape)
    feats = rng.randn(80, 6).astype(np.float32)
    w = rng.randn(3, 3, 3, 6, 5).astype(np.float32)

    grid = build_index_grid(jnp.asarray(coords), jnp.ones(80, bool), shape)
    ours = np.asarray(subm_conv3d(jnp.asarray(feats), jnp.asarray(coords),
                                  grid, shape, jnp.asarray(w),
                                  jnp.ones(80, bool)))

    dense = _densify(feats, coords, shape)
    w_t = torch.from_numpy(np.transpose(w, (4, 3, 0, 1, 2)))  # (co, ci, kd, kh, kw)
    out = F.conv3d(torch.from_numpy(dense)[None], w_t, padding=1)[0].numpy()
    oracle = out[:, coords[:, 0], coords[:, 1], coords[:, 2]].T
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_stride_conv_matches_dense_strided_conv():
    rng = np.random.RandomState(1)
    shape = (9, 11, 13)
    coords = _random_sites(rng, 60, shape)
    feats = rng.randn(60, 4).astype(np.float32)
    w = rng.randn(3, 3, 3, 4, 7).astype(np.float32)

    grid = build_index_grid(jnp.asarray(coords), jnp.ones(60, bool), shape)
    new_coords, new_valid, new_shape, _ = downsample_sites(
        jnp.asarray(coords), jnp.ones(60, bool), shape, cap=256)
    ours = np.asarray(stride_conv3d(jnp.asarray(feats), grid, shape,
                                    new_coords, jnp.asarray(w), new_valid,
                                    jnp.ones(60, bool)))

    dense = _densify(feats, coords, shape)
    w_t = torch.from_numpy(np.transpose(w, (4, 3, 0, 1, 2)))
    out = F.conv3d(torch.from_numpy(dense)[None], w_t, padding=1, stride=2)[0].numpy()
    assert out.shape[1:] == new_shape

    nc = np.asarray(new_coords)
    nv = np.asarray(new_valid)
    oracle = out[:, nc[nv, 0], nc[nv, 1], nc[nv, 2]].T
    np.testing.assert_allclose(ours[nv], oracle, atol=1e-4)

    # site set is exact: every nonzero output voxel of the dense conv must
    # be in our site list (the conv can produce zeros at covered sites too)
    nonzero = np.argwhere(np.abs(out).sum(0) > 1e-6)
    site_set = {tuple(c) for c in nc[nv]}
    for v in nonzero:
        assert tuple(v) in site_set


def test_trilinear_readout_matches_dense_grid_sample():
    rng = np.random.RandomState(2)
    shape = (8, 10, 12)
    coords = _random_sites(rng, 50, shape)
    feats = rng.randn(50, 3).astype(np.float32)
    grid = build_index_grid(jnp.asarray(coords), jnp.ones(50, bool), shape)

    pos = rng.rand(200, 3).astype(np.float32) * (np.array(shape) - 1)
    ours = np.asarray(trilinear_site_sample(jnp.asarray(feats), grid, shape,
                                            jnp.asarray(pos)))

    dense = _densify(feats, coords, shape)
    # torch grid_sample align_corners=True with xyz = reversed dhw
    norm = (pos / (np.array(shape, np.float32) - 1) * 2 - 1).astype(np.float32)
    xyz = norm[:, ::-1].copy()
    ref = F.grid_sample(torch.from_numpy(dense)[None],
                        torch.from_numpy(xyz)[None, None, None],
                        mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0, :, 0, 0].numpy().T
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_sparse_convnet_end_to_end():
    rng = np.random.RandomState(3)
    verts = rng.randn(500, 3).astype(np.float32) * 0.3
    min_dhw, out_sh = prepare_voxel_volume(verts)
    assert all(s % 32 == 0 for s in out_sh)

    coords = voxelize_coords(jnp.asarray(verts), min_dhw)
    feats = jnp.asarray(rng.randn(500, 32).astype(np.float32))
    query = world_to_voxel_f(jnp.asarray(verts[:64]), min_dhw)

    model = SparseConvNet(num_layers=4, out_sh=out_sh, caps=(1024, 1024, 1024))
    variables = model.init(jax.random.PRNGKey(0), feats, coords, query)
    out = jax.jit(lambda v, f, c, q: model.apply(v, f, c, q))(
        variables, feats, coords, query)
    assert out.shape == (64, 32 + 64 + 96)
    assert bool(jnp.isfinite(out).all())
    # queries at occupied sites should see nonzero features
    assert float(jnp.abs(out).sum()) > 0


def test_subm_conv_grad_matches_scatter_adjoint():
    """The inverse-neighbor-gather adjoint must equal the plain scatter-add
    adjoint exactly (it is a reindexing, not an approximation)."""
    rng = np.random.RandomState(7)
    shape = (10, 12, 14)
    coords = _random_sites(rng, 80, shape)
    # rows 64.. are invalid padding sharing real coords semantics
    valid = jnp.asarray(np.arange(80) < 64)
    feats = jnp.asarray(rng.randn(80, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 6, 5).astype(np.float32))
    grid = build_index_grid(jnp.asarray(coords), valid, shape)
    cot = jnp.asarray(rng.randn(80, 5).astype(np.float32))
    # masked output, as in SparseStage (invalid rows carry no gradient)
    cot = cot * valid[:, None]

    def ours(f, ww):
        out = subm_conv3d(f, jnp.asarray(coords), grid, shape, ww, valid)
        return jnp.sum(out * cot)

    def ref(f, ww):
        from sherf_tpu.features.sparseconv import neighbor_ids
        nbr = neighbor_ids(grid, shape, jnp.asarray(coords))
        fp = jnp.concatenate([jnp.zeros((1, 6), f.dtype), f], 0)
        rows = fp[nbr.reshape(-1)].reshape(80, 27, 6)
        out = jnp.einsum("ski,kio->so", rows, ww.reshape(27, 6, 5))
        return jnp.sum(out * cot)

    # BOTH hand-written adjoints of the custom VJP: d_feats (inverse-table
    # gather) and d_w (rows.T @ g recompute) — the d_w path feeds training
    # and was previously untested (advisor r4)
    np.testing.assert_allclose(np.asarray(jax.grad(ours)(feats, w)),
                               np.asarray(jax.grad(ref)(feats, w)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(ours, argnums=1)(feats, w)),
        np.asarray(jax.grad(ref, argnums=1)(feats, w)),
        rtol=1e-5, atol=1e-5)


def test_stride_conv_grad_matches_scatter_adjoint():
    rng = np.random.RandomState(8)
    shape = (9, 11, 13)
    coords = _random_sites(rng, 60, shape)
    valid_in = jnp.asarray(np.arange(60) < 50)
    feats = jnp.asarray(rng.randn(60, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 7).astype(np.float32))
    grid = build_index_grid(jnp.asarray(coords), valid_in, shape)
    new_coords, new_valid, new_shape, _ = downsample_sites(
        jnp.asarray(coords), valid_in, shape, cap=256)
    cot = jnp.asarray(rng.randn(256, 7).astype(np.float32))
    cot = cot * new_valid[:, None]

    def ours(f, ww):
        out = stride_conv3d(f, grid, shape, new_coords, ww, new_valid,
                            valid_in)
        return jnp.sum(out * cot)

    def ref(f, ww):
        from sherf_tpu.features.sparseconv import neighbor_ids
        nbr = neighbor_ids(grid, shape, 2 * new_coords)
        fp = jnp.concatenate([jnp.zeros((1, 4), f.dtype), f], 0)
        rows = fp[nbr.reshape(-1)].reshape(256, 27, 4)
        out = jnp.einsum("ski,kio->so", rows, ww.reshape(27, 4, 7))
        return jnp.sum(out * cot)

    # d_feats AND the hand-derived d_w (advisor r4: d_w was untested)
    np.testing.assert_allclose(np.asarray(jax.grad(ours)(feats, w)),
                               np.asarray(jax.grad(ref)(feats, w)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(ours, argnums=1)(feats, w)),
        np.asarray(jax.grad(ref, argnums=1)(feats, w)),
        rtol=1e-5, atol=1e-5)


def test_dense_readout_matches_index_readout():
    from sherf_tpu.features.sparseconv import trilinear_dense_sample
    rng = np.random.RandomState(5)
    shape = (8, 10, 12)
    coords = _random_sites(rng, 50, shape)
    feats = rng.randn(50, 4).astype(np.float32)
    valid = jnp.ones(50, bool)
    grid = build_index_grid(jnp.asarray(coords), valid, shape)
    pos = rng.rand(300, 3).astype(np.float32) * (np.array(shape) + 1) - 1  # incl. oob
    a = np.asarray(trilinear_site_sample(jnp.asarray(feats), grid, shape,
                                         jnp.asarray(pos)))
    b = np.asarray(trilinear_dense_sample(jnp.asarray(feats), jnp.asarray(coords),
                                          valid, shape, jnp.asarray(pos)))
    np.testing.assert_allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------------------
# dense-conv dispatch for coarse scales (r5): identical math, MXU form


def test_dense_stage_matches_sparse_stage():
    """SparseStage(dense=True) — densify -> XLA conv3d -> gather — must
    reproduce the gathered sparse form (same params) in value AND in both
    gradients (the sparse path runs a hand-written VJP, the dense path
    XLA autodiff)."""
    from sherf_tpu.features.sparseconv import SparseStage, pack_grid_yx

    rng = np.random.RandomState(11)
    shape = (10, 12, 14)
    coords = jnp.asarray(_random_sites(rng, 80, shape))
    valid = jnp.asarray(np.arange(80) < 64)
    feats = jnp.asarray(rng.randn(80, 6).astype(np.float32))
    grid = build_index_grid(coords, valid, shape)
    packed = pack_grid_yx(grid, shape, 80)

    stage = SparseStage(8, 2)
    variables = stage.init(jax.random.PRNGKey(0), feats, coords, packed,
                           shape, valid)

    def run(f, v, dense):
        return stage.apply(v, f, coords, packed if not dense else None,
                           shape, valid, dense=dense)

    out_s = run(feats, variables, False)
    out_d = run(feats, variables, True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-4, atol=1e-4)

    cot = jnp.asarray(rng.randn(*out_s.shape).astype(np.float32))
    g_s = jax.grad(lambda f, v: jnp.sum(run(f, v, False) * cot),
                   argnums=(0, 1))(feats, variables)
    g_d = jax.grad(lambda f, v: jnp.sum(run(f, v, True) * cot),
                   argnums=(0, 1))(feats, variables)
    np.testing.assert_allclose(np.asarray(g_d[0]), np.asarray(g_s[0]),
                               rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        g_d[1]["params"], g_s[1]["params"])


def test_dense_down_matches_sparse_down():
    from sherf_tpu.features.sparseconv import SparseDown, pack_grid_yx

    rng = np.random.RandomState(12)
    shape = (9, 11, 13)
    coords = jnp.asarray(_random_sites(rng, 60, shape))
    valid = jnp.asarray(np.arange(60) < 50)
    feats = jnp.asarray(rng.randn(60, 4).astype(np.float32))
    grid = build_index_grid(coords, valid, shape)
    packed = pack_grid_yx(grid, shape, 60)

    down = SparseDown(8, cap=128)
    variables = down.init(jax.random.PRNGKey(0), feats, coords, grid,
                          packed, shape, valid)

    def run(dense):
        return down.apply(variables, feats, coords, grid, packed, shape,
                          valid, dense=dense, need_packed=not dense)

    out_s, c_s, g_s, p_s, sh_s, v_s = run(False)
    out_d, c_d, g_d, p_d, sh_d, v_d = run(True)
    assert sh_s == sh_d
    np.testing.assert_array_equal(np.asarray(c_s), np.asarray(c_d))
    np.testing.assert_array_equal(np.asarray(v_s), np.asarray(v_d))
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=1e-4, atol=1e-4)
    assert p_d is None and p_s is not None


def test_dense_scales_convnet_matches_sparse(monkeypatch):
    """Whole SparseConvNet with every eligible scale dense vs all-sparse:
    same params, matching multi-scale readout features."""
    import sherf_tpu.features.sparseconv as sc

    rng = np.random.RandomState(13)
    verts = rng.randn(500, 3).astype(np.float32) * 0.3
    min_dhw, out_sh = prepare_voxel_volume(verts)
    coords = voxelize_coords(jnp.asarray(verts), min_dhw)
    feats = jnp.asarray(rng.randn(500, 32).astype(np.float32))
    query = world_to_voxel_f(jnp.asarray(verts[:64]), min_dhw)

    model = SparseConvNet(num_layers=4, out_sh=out_sh, caps=(1024, 1024, 1024))

    monkeypatch.setattr(sc, "DENSE_SCALES", frozenset())
    variables = model.init(jax.random.PRNGKey(0), feats, coords, query)
    out_sparse = model.apply(variables, feats, coords, query)

    monkeypatch.setattr(sc, "DENSE_SCALES", frozenset({1, 2, 3}))
    out_dense = model.apply(variables, feats, coords, query)
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_sparse),
                               rtol=1e-3, atol=1e-3)
