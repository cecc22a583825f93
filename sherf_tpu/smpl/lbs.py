"""SMPL linear blend skinning math in pure jnp.

Re-derivation of the reference's three SMPL code paths with one shared core:
  * host NumPy forward     (reference smpl/smpl_numpy.py:46-98)
  * torch transform utils  (reference renderer.py:76-157 batch_rodrigues_torch,
                            get_rigid_transformation_torch, get_transform_params_torch)
  * blendshape correction tables used by the warps (renderer.py:576-609)

All functions are single-sample; batch with jax.vmap at the call site.  The
24-step FK chain is unrolled statically (XLA-friendly: 24 tiny matmuls).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sherf_tpu.smpl.model import SMPLModel, N_JOINTS


def rodrigues(r: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches the reference's torch variants, which compute the angle as
    ``norm(r + eps)`` (renderer.py:80,174) so that zero rotations are safe.
    """
    r = r + eps
    angle = jnp.linalg.norm(r, axis=-1, keepdims=True)  # (..., 1)
    axis = r / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(*r.shape[:-1], 3, 3)
    ident = jnp.eye(3, dtype=r.dtype)
    return ident + sin * K + (1.0 - cos) * (K @ K)


def rigid_transforms(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                     parents: jnp.ndarray) -> jnp.ndarray:
    """Per-joint world transforms relative to the rest pose.

    rot_mats: (24, 3, 3); joints: (24, 3) rest joints; parents: (24,).
    Returns A: (24, 4, 4) such that skinned x = sum_j w_j A_j [x_rest; 1]
    (reference get_rigid_transformation_torch, renderer.py:96-126).
    """
    parents = np.asarray(parents)  # static ints for unrolled FK
    rel = joints.at[1:].add(-joints[parents[1:]])
    bottom = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]], rot_mats.dtype), (N_JOINTS, 1, 1))
    local = jnp.concatenate(
        [jnp.concatenate([rot_mats, rel[:, :, None]], axis=-1), bottom], axis=-2
    )  # (24, 4, 4)

    chain = [local[0]]
    for i in range(1, N_JOINTS):
        chain.append(chain[int(parents[i])] @ local[i])
    fk = jnp.stack(chain, axis=0)  # (24, 4, 4) world-from-local at rest joints

    # Subtract the transformed rest joints so A acts on rest-space points.
    joints_h = jnp.concatenate([joints, jnp.zeros((N_JOINTS, 1), joints.dtype)], axis=-1)
    posed = jnp.einsum("jab,jb->ja", fk, joints_h)  # (24, 4)
    A = fk.at[..., 3].add(-posed)
    return A


def _fk_joints(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents) -> jnp.ndarray:
    """Posed joint positions (the ``joints`` returned by smpl_numpy.py:85)."""
    parents = np.asarray(parents)
    rel = joints.at[1:].add(-joints[parents[1:]])
    bottom = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]], rot_mats.dtype), (N_JOINTS, 1, 1))
    local = jnp.concatenate(
        [jnp.concatenate([rot_mats, rel[:, :, None]], axis=-1), bottom], axis=-2
    )
    chain = [local[0]]
    for i in range(1, N_JOINTS):
        chain.append(chain[int(parents[i])] @ local[i])
    return jnp.stack(chain, axis=0)[:, :3, 3]


def pose_offsets_table(model: SMPLModel, poses: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex pose blendshape offsets, (6890, 3).

    poses: (72,) axis-angle.  offsets = posedirs . vec(R[1:] - I)
    (reference renderer.py:580-584 and smpl_numpy.py:68-71).
    """
    R = rodrigues(poses.reshape(N_JOINTS, 3))
    feat = (R[1:] - jnp.eye(3, dtype=R.dtype)).reshape(-1)  # (207,)
    return jnp.einsum("vcp,p->vc", model.posedirs, feat)


def shape_offsets_table(model: SMPLModel, shapes: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex shape blendshape offsets, (6890, 3).  shapes: (10,)."""
    return jnp.einsum("vcs,s->vc", model.shapedirs, shapes)


def smpl_forward(model: SMPLModel, poses: jnp.ndarray, shapes: jnp.ndarray):
    """Full SMPL forward: (72,) pose + (10,) betas -> verts (6890,3), posed joints (24,3).

    Mirrors the host-side NumPy SMPL (smpl_numpy.py:46-98) used by the
    datasets to produce canonical/posed vertices.
    """
    v_shaped = model.v_template + shape_offsets_table(model, shapes)
    J = model.J_regressor @ v_shaped  # (24, 3)
    if poses.shape == (N_JOINTS, 3, 3):
        R = poses
    else:
        R = rodrigues(poses.reshape(N_JOINTS, 3))
    v_posed = v_shaped + jnp.einsum(
        "vcp,p->vc", model.posedirs, (R[1:] - jnp.eye(3, dtype=R.dtype)).reshape(-1)
    )
    A = rigid_transforms(R, J, model.parents)
    T = jnp.einsum("vj,jab->vab", model.weights, A)  # (6890, 4, 4)
    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]
    joints = _fk_joints(R, J, model.parents)
    return verts, joints


def transform_params(model: SMPLModel, poses: jnp.ndarray, shapes: jnp.ndarray):
    """LBS bone transforms for a posed body (reference get_transform_params_torch,
    renderer.py:129-157).

    poses: (72,), shapes: (10,).  Returns (A (24,4,4), joints (24,3)).
    """
    v_shaped = model.v_template + shape_offsets_table(model, shapes)
    joints = model.J_regressor @ v_shaped
    rot_mats = rodrigues(poses.reshape(N_JOINTS, 3))
    A = rigid_transforms(rot_mats, joints, model.parents)
    return A, joints


def big_pose_params() -> dict:
    """Canonical 'big pose': legs spread 45deg, knees bent 30deg
    (reference THuman_dataset.py:244-257).  Returns numpy arrays."""
    poses = np.zeros((72,), dtype=np.float32)
    poses[5] = 45 / 180 * np.pi
    poses[8] = -45 / 180 * np.pi
    poses[23] = -30 / 180 * np.pi
    poses[26] = 30 / 180 * np.pi
    return dict(
        poses=poses,
        shapes=np.zeros((10,), dtype=np.float32),
        R=np.eye(3, dtype=np.float32),
        Th=np.zeros((3,), dtype=np.float32),
    )
