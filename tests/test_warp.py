"""Inverse-LBS warp invariants.

The warps are exact at the SMPL vertices: warping posed vertices to the
canonical space must return the big-pose mean-shape vertices (t_vertices),
and warping those back to a source pose must return that pose's world
vertices.  Both sides use independently-validated smpl_forward as oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sherf_tpu.core.types import SMPLPose
from sherf_tpu.smpl import synthetic_smpl, smpl_forward, big_pose_params
from sherf_tpu.nerf import make_pose_context, deform_target2c, deform_c2source


@pytest.fixture(scope="module")
def setup():
    smpl = synthetic_smpl(0)
    rng = np.random.RandomState(0)
    bp = big_pose_params()
    t_pose = SMPLPose(poses=jnp.asarray(bp["poses"]), shapes=jnp.asarray(bp["shapes"]),
                      R=jnp.asarray(bp["R"]), Th=jnp.asarray(bp["Th"]))
    t_verts, _ = smpl_forward(smpl, t_pose.poses, t_pose.shapes)
    return smpl, rng, t_pose, t_verts


def _random_pose(rng, scale=0.3):
    poses = (rng.randn(72) * scale).astype(np.float32)
    shapes = (rng.randn(10) * 0.4).astype(np.float32)
    import cv2
    R, _ = cv2.Rodrigues(rng.randn(3).astype(np.float32) * 0.5)
    Th = rng.randn(3).astype(np.float32) * 0.3
    return SMPLPose(poses=jnp.asarray(poses), shapes=jnp.asarray(shapes),
                    R=jnp.asarray(R.astype(np.float32)), Th=jnp.asarray(Th))


def test_target2c_recovers_canonical_vertices(setup):
    smpl, rng, t_pose, t_verts = setup
    pose = _random_pose(rng)
    ctx_pose = make_pose_context(smpl, pose)
    ctx_big = make_pose_context(smpl, t_pose)

    posed, _ = smpl_forward(smpl, pose.poses, pose.shapes)  # SMPL-frame verts
    vid = jnp.arange(posed.shape[0])
    can = deform_target2c(smpl, ctx_pose, ctx_big, vid, posed)
    np.testing.assert_allclose(np.asarray(can), np.asarray(t_verts), atol=1e-3)


def test_target2c_viewdirs_shape(setup):
    smpl, rng, t_pose, t_verts = setup
    pose = _random_pose(rng)
    ctx_pose = make_pose_context(smpl, pose)
    ctx_big = make_pose_context(smpl, t_pose)
    posed, _ = smpl_forward(smpl, pose.poses, pose.shapes)
    vid = jnp.arange(posed.shape[0])
    dirs = jnp.ones_like(posed)
    can, can_dirs = deform_target2c(smpl, ctx_pose, ctx_big, vid, posed, dirs)
    assert can.shape == posed.shape and can_dirs.shape == dirs.shape


def test_c2source_recovers_world_vertices(setup):
    smpl, rng, t_pose, t_verts = setup
    pose = _random_pose(rng)
    ctx_src = make_pose_context(smpl, pose)
    ctx_big = make_pose_context(smpl, t_pose)

    vid = jnp.arange(t_verts.shape[0])
    smpl_src, world_src, bw = deform_c2source(smpl, ctx_src, ctx_big, vid, t_verts)

    v_smpl, _ = smpl_forward(smpl, pose.poses, pose.shapes)
    np.testing.assert_allclose(np.asarray(smpl_src), np.asarray(v_smpl), atol=1e-3)

    world = np.asarray(v_smpl) @ np.linalg.inv(np.asarray(pose.R)) + np.asarray(pose.Th)
    np.testing.assert_allclose(np.asarray(world_src), world, atol=1e-3)
    np.testing.assert_allclose(np.asarray(bw.sum(-1)), 1.0, atol=1e-5)


def test_roundtrip_pose_to_pose(setup):
    """posed A -> canonical -> posed B -> canonical again is stable."""
    smpl, rng, t_pose, t_verts = setup
    pose_a = _random_pose(rng)
    ctx_a = make_pose_context(smpl, pose_a)
    ctx_big = make_pose_context(smpl, t_pose)
    posed_a, _ = smpl_forward(smpl, pose_a.poses, pose_a.shapes)
    vid = jnp.arange(posed_a.shape[0])
    can = deform_target2c(smpl, ctx_a, ctx_big, vid, posed_a)
    smpl_back, _, _ = deform_c2source(smpl, ctx_a, ctx_big, vid, can)
    np.testing.assert_allclose(np.asarray(smpl_back), np.asarray(posed_a), atol=1e-3)
