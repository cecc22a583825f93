"""Pytree value types shared across the framework.

The reference passes loosely-typed dicts of numpy/torch arrays between the
dataset, training loop and model (e.g. the ``ret`` dict of
``THuman_dataset.py:399-428``).  We keep the same *information* but as typed
flax pytrees so they flow through jit/vmap/pjit cleanly.
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp


@struct.dataclass
class SMPLPose:
    """Per-frame SMPL parameters (reference per-item ``params`` dict:
    poses/shapes/R/Th, e.g. THuman_dataset.py:312-315)."""

    poses: jnp.ndarray   # (..., 72) axis-angle, root first
    shapes: jnp.ndarray  # (..., 10) betas
    R: jnp.ndarray       # (..., 3, 3) global rotation (world -> smpl convention quirks preserved)
    Th: jnp.ndarray      # (..., 3) global translation


@struct.dataclass
class Camera:
    """Pinhole camera: world -> pixel via K [R|T]."""

    K: jnp.ndarray  # (..., 3, 3)
    R: jnp.ndarray  # (..., 3, 3)
    T: jnp.ndarray  # (..., 3, 1)


@struct.dataclass
class Rays:
    """A bundle of rays with AABB entry/exit distances."""

    origins: jnp.ndarray     # (..., N, 3)
    directions: jnp.ndarray  # (..., N, 3) NOT normalized (pixel-footprint scaled, as reference)
    near: jnp.ndarray        # (..., N)
    far: jnp.ndarray         # (..., N)
    mask_at_box: jnp.ndarray  # (..., N) bool — ray intersects the body AABB


@struct.dataclass
class SHERFBatch:
    """One device batch — the typed equivalent of the reference datasets'
    ``ret`` dict (THuman_dataset.py:399-428).  Images are NHWC in [0, 1];
    rays are flattened H*W.  All leading dims are the batch B."""

    # canonical (big-pose, mean-shape) space
    t_pose: SMPLPose          # broadcast per sample
    t_vertices: jnp.ndarray   # (B, 6890, 3)
    t_bounds: jnp.ndarray     # (B, 2, 3) world bounds incl. z padding

    # target view
    pose: SMPLPose
    vertices: jnp.ndarray     # (B, 6890, 3) posed world vertices
    img: jnp.ndarray          # (B, H, W, 3) target image
    ray_o: jnp.ndarray        # (B, N, 3)
    ray_d: jnp.ndarray        # (B, N, 3)
    near: jnp.ndarray         # (B, N)
    far: jnp.ndarray          # (B, N)
    mask_at_box: jnp.ndarray  # (B, N) bool
    bkgd_msk: jnp.ndarray     # (B, N) float foreground mask

    # observation view
    obs_pose: SMPLPose
    obs_vertices: jnp.ndarray  # (B, 6890, 3)
    obs_img: jnp.ndarray       # (B, Ho, Wo, 3)
    obs_K: jnp.ndarray         # (B, 3, 3)
    obs_R: jnp.ndarray         # (B, 3, 3)
    obs_T: jnp.ndarray         # (B, 3, 1)
