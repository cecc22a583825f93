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


# ---------------------------------------------------------------------------
# Column (structure-of-arrays) helpers: per-point 3x3/3-vector math on
# (N, 3)-shaped tensors runs at 3/128 lane utilization on TPU (the minor
# dim maps to the 128-lane axis), and the warp chain's subs/adds/matvecs
# traced ~6 ms of the production frame in that form.  Operating on (N,)
# COLUMNS keeps every elementwise op full-lane; only the bw @ A blends
# stay matrices (they are real MXU matmuls).


def _mat_cols(A_pt: jnp.ndarray):
    """(N, 16) row-major blended 4x4 -> (9 rotation cols, 3 translation
    cols), each (N,)."""
    R = [A_pt[:, 4 * a + b] for a in range(3) for b in range(3)]
    t = [A_pt[:, 4 * a + 3] for a in range(3)]
    return R, t


def _inv3_cols(r):
    """Adjugate/det inverse on 9 row-major (N,) columns (same math as
    :func:`_inv3`)."""
    a, b, c, d, e, f, g, h, i = r
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
    return [A / det, B / det, C / det, D / det, E / det,
            F / det, G / det, H / det, I / det]


def _mv_cols(R, v):
    """y_a = sum_b R[3a+b] v_b on columns."""
    return [R[3 * a + 0] * v[0] + R[3 * a + 1] * v[1] + R[3 * a + 2] * v[2]
            for a in range(3)]


@_f32_matmuls
def deform_target2c_from_tables(ctx_pose: PoseContext, ctx_big: PoseContext,
                                payload: jnp.ndarray, q_pts: jnp.ndarray,
                                q_dirs: Optional[jnp.ndarray] = None):
    """Core of the posed->canonical warp given the nearest-vertex payload
    (see :func:`target2c_tables`).  payload: (N, 33)."""
    bw = payload[:, :24]

    A_pt = bw @ ctx_pose.A.reshape(24, 16)          # (N, 16) — MXU
    R, t = _mat_cols(A_pt)
    Ri = _inv3_cols(R)
    can = _mv_cols(Ri, [q_pts[:, a] - t[a] for a in range(3)])
    if q_dirs is not None:
        dirs = _mv_cols(Ri, [q_dirs[:, a] for a in range(3)])

    # pose/shape blendshape corrections -> mean-shape T pose -> big pose
    can = [can[a] - payload[:, 24 + a] - payload[:, 27 + a]
           + payload[:, 30 + a] for a in range(3)]

    A_big = bw @ ctx_big.A.reshape(24, 16)
    Rb, tb = _mat_cols(A_big)
    can = [v + tb[a] for a, v in enumerate(_mv_cols(Rb, can))]
    if q_dirs is not None:
        dirs = _mv_cols(Rb, dirs)
        return jnp.stack(can, axis=-1), jnp.stack(dirs, axis=-1)
    return jnp.stack(can, axis=-1)


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

    A_big = bw @ ctx_big.A.reshape(24, 16)          # (N, 16) — MXU
    Rb, tb = _mat_cols(A_big)
    q = _mv_cols(_inv3_cols(Rb), [q_pts[:, a] - tb[a] for a in range(3)])

    # big pose -> T pose (mean shape), then to the source's shape/pose
    q = [q[a] - big_off[:, a] + shape_off[:, a] + pose_off[:, a]
         for a in range(3)]

    A_src = bw @ ctx_src.A.reshape(24, 16)
    Rs, ts = _mat_cols(A_src)
    sm = [v + ts[a] for a, v in enumerate(_mv_cols(Rs, q))]

    # SMPL coords -> world (renderer.py:680-682): smpl = (world - Th) @ R,
    # so world = smpl @ inv(R) + Th — inv(R) is one 3x3, broadcast as
    # scalars over the columns
    Rinv = _inv3(ctx_src.R)
    world = [sm[0] * Rinv[0, a] + sm[1] * Rinv[1, a] + sm[2] * Rinv[2, a]
             + ctx_src.Th[a] for a in range(3)]
    smpl_src = jnp.stack(sm, axis=-1)
    world_src = jnp.stack(world, axis=-1)
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
