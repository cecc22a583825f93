"""Iso-surface extraction + PLY/MRC I/O (replaces reference shape_utils.py,
which wraps skimage.measure.marching_cubes / plyfile / mrcfile)."""

import numpy as np
import pytest

from sherf_tpu.geometry.shape import (
    convert_sdf_samples_to_ply, marching_tetrahedra,
    read_mrc, read_ply, write_mrc, write_ply)


def _sphere_sdf(n=33, r=0.6):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - r, 2.0 / (n - 1)


def test_marching_tetrahedra_sphere_geometry():
    sdf, spacing = _sphere_sdf()
    verts, faces = marching_tetrahedra(sdf, level=0.0,
                                       spacing=(spacing,) * 3,
                                       origin=(-1.0, -1.0, -1.0))
    assert len(verts) > 500 and len(faces) > 1000
    radii = np.linalg.norm(verts, axis=1)
    # every surface vertex sits on the r=0.6 sphere (within one voxel)
    assert np.abs(radii - 0.6).max() < spacing
    # surface area of the triangulation ~ 4*pi*r^2
    a, b, c = (verts[faces[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert abs(area - 4 * np.pi * 0.36) / (4 * np.pi * 0.36) < 0.05
    # all face indices valid
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_marching_tetrahedra_empty_and_level():
    sdf, _ = _sphere_sdf(17)
    verts, faces = marching_tetrahedra(sdf, level=-2.0)  # below min: empty
    assert len(verts) == 0 and len(faces) == 0
    # level semantics: crossing at sdf == 0.2 gives a larger sphere
    v_small, _ = marching_tetrahedra(sdf, level=0.0, origin=(-8,) * 3)
    v_big, _ = marching_tetrahedra(sdf, level=0.2, origin=(-8,) * 3)
    assert np.linalg.norm(v_big, axis=1).mean() > np.linalg.norm(
        v_small, axis=1).mean()


def test_ply_roundtrip(tmp_path):
    sdf, spacing = _sphere_sdf(17)
    verts, faces = marching_tetrahedra(sdf, level=0.0, spacing=(spacing,) * 3)
    path = str(tmp_path / "mesh.ply")
    write_ply(path, verts, faces)
    v2, f2 = read_ply(path)
    np.testing.assert_array_equal(v2, verts)
    np.testing.assert_array_equal(f2, faces)
    head = open(path, "rb").read(64)
    assert head.startswith(b"ply\nformat binary_little_endian 1.0")


def test_convert_sdf_samples_to_ply_offsets(tmp_path):
    sdf, spacing = _sphere_sdf(17)
    path = str(tmp_path / "s.ply")
    convert_sdf_samples_to_ply(sdf, [-1.0, -1.0, -1.0], spacing, path,
                               offset=[0.5, 0.0, 0.0], scale=2.0, level=0.0)
    verts, faces = read_ply(path)
    assert len(faces) > 0
    # verts/scale - offset applied (reference shape_utils.py:74-78)
    center = verts.mean(0)
    np.testing.assert_allclose(center, [-0.5, 0.0, 0.0], atol=0.05)


def test_mrc_roundtrip(tmp_path):
    vol = np.random.RandomState(0).randn(9, 7, 5).astype(np.float32)
    path = str(tmp_path / "v.mrc")
    write_mrc(path, vol, voxel_size=0.01)
    back = read_mrc(path)
    np.testing.assert_array_equal(back, vol)
    raw = open(path, "rb").read()
    assert raw[208:212] == b"MAP " and len(raw) == 1024 + vol.size * 4


@pytest.mark.slow
def test_query_canonical_density_field():
    """The generator's density probe: high density at the body, empty far
    away, and consistent with what the renderer composits."""
    import jax
    import jax.numpy as jnp

    from sherf_tpu.core.config import ModelConfig, RenderConfig
    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params

    smpl = synthetic_smpl(0)
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts)
    cfg = ModelConfig(render=RenderConfig(depth_resolution=4,
                                          density_noise=0.0))
    model = SHERFGenerator(cfg, out_sh=out_sh)
    batch = make_synthetic_batch(smpl, batch_size=1, H=8, W=8, seed=0)
    variables = model.init(jax.random.PRNGKey(0), batch, smpl)

    surf = jnp.asarray(t_verts[None, :64])          # on-body points
    far = surf + 5.0                                 # far outside any bank
    out_s = model.apply(variables, batch, smpl, surf,
                        method=model.query_canonical)
    out_f = model.apply(variables, batch, smpl, far,
                        method=model.query_canonical)
    assert out_s["rgb"].shape == (1, 64, 3)
    assert out_s["sigma"].shape == (1, 64, 1)
    assert np.isfinite(np.asarray(out_s["sigma"], np.float32)).all()
    assert np.isfinite(np.asarray(out_f["sigma"], np.float32)).all()
