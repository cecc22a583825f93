"""SMPL-driven space warps between observation / target / canonical poses.

Re-derivation of the reference's inverse-LBS machinery
(renderer.coarse_deform_target2c:558-621 and coarse_deform_c2source:623-684)
as pure functions over a precomputed :class:`PoseContext` — the per-frame
bone transforms and blendshape offset tables are built ONCE per sample and
reused by every warp call (the reference recomputes them inside each call).

All functions are single-sample (vmap for batch) and operate on static-shape
point sets; nearest-vertex ids come in precomputed from the fused KNN.
"""

from __future__ import annotations

from typing import Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp

from sherf_tpu.core.types import SMPLPose
from sherf_tpu.smpl.model import SMPLModel
from sherf_tpu.smpl.lbs import (
    transform_params, pose_offsets_table, shape_offsets_table,
)


@struct.dataclass
class PoseContext:
    """Everything pose-dependent the warps need, computed once per frame."""

    A: jnp.ndarray             # (24, 4, 4) bone transforms (rest -> posed)
    R: jnp.ndarray             # (3, 3) global rotation
    Th: jnp.ndarray            # (3,) global translation
    pose_offsets: jnp.ndarray  # (6890, 3) pose blendshape offsets
    shape_offsets: jnp.ndarray  # (6890, 3) shape blendshape offsets
    joints: jnp.ndarray        # (24, 3) posed joints (SMPL frame)


def _f32_matmuls(fn):
    """Run the wrapped geometry function with full-f32 matmuls.

    TPU XLA's DEFAULT f32 matmul precision keeps ~bf16 mantissas per pass;
    on the LBS blend (bw @ A) and rigid-transform einsums that is ~mm-cm of
    world-coordinate error feeding every downstream feature lookup (r3
    find: full-size parity vs the f32 torch reference capped at ~50 dB).
    These ops are (N,24)x(24,16)-sized — full precision costs nothing
    measurable."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


@_f32_matmuls
def make_pose_context(smpl: SMPLModel, pose: SMPLPose) -> PoseContext:
    poses = pose.poses.reshape(-1)
    shapes = pose.shapes.reshape(-1)
    A, rest_joints = transform_params(smpl, poses, shapes)
    posed_joints = jnp.einsum("jab,jb->ja", A[:, :3, :3], rest_joints) \
        + A[:, :3, 3]
    return PoseContext(
        A=A,
        R=pose.R.reshape(3, 3),
        Th=pose.Th.reshape(3),
        pose_offsets=pose_offsets_table(smpl, poses),
        shape_offsets=shape_offsets_table(smpl, shapes),
        joints=posed_joints,
    )


def _inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det) — far cheaper on TPU
    than an LU factorization for millions of tiny matrices."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1),
    ], -2)
    return adj / det[..., None, None]


def _blend_A(weights_table: jnp.ndarray, vid: jnp.ndarray,
             A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point blended bone transform: bw = weights[vid] (N, 24);
    A_pt = bw @ A — one MXU matmul (N,24)x(24,16)."""
    bw = weights_table[vid]  # (N, 24)
    A_pt = (bw @ A.reshape(24, 16)).reshape(-1, 4, 4)
    return A_pt, bw


@_f32_matmuls
def target2c_tables(smpl: SMPLModel, ctx_pose: PoseContext,
                    ctx_big: PoseContext) -> jnp.ndarray:
    """Per-vertex payload consumed by :func:`deform_target2c_from_tables`:
    [blend weights (24) | pose_off (3) | shape_off (3) | big_pose_off (3)].
    Feed to kernels.knn.nn_1_tables so the KNN returns it pre-gathered."""
    return jnp.concatenate([
        smpl.weights, ctx_pose.pose_offsets, ctx_pose.shape_offsets,
        ctx_big.pose_offsets], axis=-1)


@_f32_matmuls
def c2source_tables(smpl: SMPLModel, ctx_src: PoseContext,
                    ctx_big: PoseContext) -> jnp.ndarray:
    """Payload for :func:`deform_c2source_from_tables`:
    [blend weights (24) | big_pose_off (3) | src_shape_off (3) | src_pose_off (3)]."""
    return jnp.concatenate([
        smpl.weights, ctx_big.pose_offsets, ctx_src.shape_offsets,
        ctx_src.pose_offsets], axis=-1)


@_f32_matmuls
def deform_target2c_from_tables(ctx_pose: PoseContext, ctx_big: PoseContext,
                                payload: jnp.ndarray, q_pts: jnp.ndarray,
                                q_dirs: Optional[jnp.ndarray] = None):
    """Core of the posed->canonical warp given the nearest-vertex payload
    (see :func:`target2c_tables`).  payload: (N, 33)."""
    bw = payload[:, :24]
    pose_off = payload[:, 24:27]
    shape_off = payload[:, 27:30]
    big_off = payload[:, 30:33]

    A_pt = (bw @ ctx_pose.A.reshape(24, 16)).reshape(-1, 4, 4)
    can = q_pts - A_pt[:, :3, 3]
    R_inv = _inv3(A_pt[:, :3, :3])
    can = jnp.einsum("nab,nb->na", R_inv, can)
    if q_dirs is not None:
        q_dirs = jnp.einsum("nab,nb->na", R_inv, q_dirs)

    # pose/shape blendshape corrections -> mean-shape T pose -> big pose
    can = can - pose_off - shape_off + big_off

    A_big = (bw @ ctx_big.A.reshape(24, 16)).reshape(-1, 4, 4)
    can = jnp.einsum("nab,nb->na", A_big[:, :3, :3], can) + A_big[:, :3, 3]
    if q_dirs is not None:
        q_dirs = jnp.einsum("nab,nb->na", A_big[:, :3, :3], q_dirs)
        return can, q_dirs
    return can


@_f32_matmuls
def deform_target2c(smpl: SMPLModel, ctx_pose: PoseContext, ctx_big: PoseContext,
                    vid: jnp.ndarray, q_pts: jnp.ndarray,
                    q_dirs: Optional[jnp.ndarray] = None):
    """SMPL-space posed points -> canonical big-pose space
    (renderer.py:558-621, mean_shape corrections on).

    q_pts: (N, 3) points in the target's SMPL coordinate frame;
    vid: (N,) nearest-vertex ids of q_pts against the posed vertices.
    """
    payload = target2c_tables(smpl, ctx_pose, ctx_big)[vid]
    return deform_target2c_from_tables(ctx_pose, ctx_big, payload,
                                       q_pts, q_dirs)


@_f32_matmuls
def deform_c2source_from_tables(ctx_src: PoseContext, ctx_big: PoseContext,
                                payload: jnp.ndarray, q_pts: jnp.ndarray,
                                weights_correction: Optional[jnp.ndarray] = None):
    """Core of the canonical->source warp given the nearest-vertex payload
    (see :func:`c2source_tables`).  Returns (smpl_src, world_src, bw)."""
    bw = payload[:, :24]
    big_off = payload[:, 24:27]
    shape_off = payload[:, 27:30]
    pose_off = payload[:, 30:33]

    if weights_correction is not None:
        bw = bw + 0.2 * weights_correction
    bw = bw / jnp.sum(bw, axis=-1, keepdims=True)

    A_big = (bw @ ctx_big.A.reshape(24, 16)).reshape(-1, 4, 4)
    q = q_pts - A_big[:, :3, 3]
    q = jnp.einsum("nab,nb->na", _inv3(A_big[:, :3, :3]), q)

    # big pose -> T pose (mean shape), then to the source's shape/pose
    q = q - big_off + shape_off + pose_off

    A_src = (bw @ ctx_src.A.reshape(24, 16)).reshape(-1, 4, 4)
    smpl_src = jnp.einsum("nab,nb->na", A_src[:, :3, :3], q) + A_src[:, :3, 3]

    # SMPL coords -> world (renderer.py:680-682): smpl = (world - Th) @ R,
    # so world = smpl @ inv(R) + Th
    world_src = smpl_src @ _inv3(ctx_src.R) + ctx_src.Th
    return smpl_src, world_src, bw


@_f32_matmuls
def deform_c2source(smpl: SMPLModel, ctx_src: PoseContext, ctx_big: PoseContext,
                    vid: jnp.ndarray, q_pts: jnp.ndarray,
                    weights_correction: Optional[jnp.ndarray] = None):
    """Canonical big-pose points -> source (observation) pose
    (renderer.py:623-684).

    vid: (N,) nearest-vertex ids of q_pts against the canonical t_vertices.
    Returns (smpl_src_pts, world_src_pts, bweights).
    """
    payload = c2source_tables(smpl, ctx_src, ctx_big)[vid]
    return deform_c2source_from_tables(ctx_src, ctx_big, payload, q_pts,
                                       weights_correction)
