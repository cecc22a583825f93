"""Host-side dataset machinery shared by the four human datasets.

This is the "TPU VM host" half of the framework: NumPy/OpenCV image and ray
preparation feeding fixed-shape device batches.  It re-derives the common
per-item pipeline the reference repeats in each loader
(sample_ray_*_batch: resize -> bound-mask -> rays -> AABB near/far, e.g.
THuman_dataset.py:104-144) and the collation into a typed SHERFBatch.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from sherf_tpu.core.types import SMPLPose, SHERFBatch
from sherf_tpu.geometry.rays import get_rays_np, near_far_aabb_np
from sherf_tpu.smpl.lbs import big_pose_params
from sherf_tpu.smpl.model import SMPLModel

import functools


@functools.cache
def _host_smpl_fn():
    import jax
    from sherf_tpu.smpl.lbs import smpl_forward

    fn = jax.jit(lambda m, p, s: smpl_forward(m, p, s))
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:  # noqa: BLE001 — no CPU backend registered
        cpu = None
    return fn, cpu


_SMPL_ON_CPU: Dict[int, object] = {}


def host_smpl_verts(smpl: SMPLModel, poses, shapes):
    """Jitted SMPL forward for the HOST data pipeline, pinned to the CPU
    backend — returns (vertices, joints) as numpy.

    The reference runs NumPy SMPL inside its DataLoader workers
    (smpl_numpy.py); here the equivalent must never touch the accelerator:
    on the remote-dispatch axon platform, loader THREADS dispatching to
    the tunneled TPU concurrently with main-thread compiles wedged the
    connection — both ends blocked in socket reads forever (r5 lifecycle
    artifact).  Unjitted it is also ~200 tunnel round trips per item.

    Pinning is by COMMITTED CPU inputs (device_put; the model pytree is
    placed once and cached) — a ``jax.default_device`` context manager
    bumps the config state on every entry and retraced the ~200-op
    forward each call (~2.5 s/item, r5)."""
    import jax

    fn, cpu = _host_smpl_fn()
    if cpu is None:
        xyz, joints = fn(smpl, np.asarray(poses), np.asarray(shapes))
    else:
        m = _SMPL_ON_CPU.get(id(smpl))
        if m is None:
            m = jax.device_put(smpl, cpu)
            _SMPL_ON_CPU[id(smpl)] = m
        xyz, joints = fn(m, jax.device_put(np.asarray(poses), cpu),
                         jax.device_put(np.asarray(shapes), cpu))
    return np.asarray(xyz), np.asarray(joints)


def get_bound_corners(bounds: np.ndarray) -> np.ndarray:
    """(reference THuman_dataset.get_bound_corners:28-41)"""
    mn, mx = bounds[0], bounds[1]
    return np.array([[mn[0], mn[1], mn[2]], [mn[0], mn[1], mx[2]],
                     [mn[0], mx[1], mn[2]], [mn[0], mx[1], mx[2]],
                     [mx[0], mn[1], mn[2]], [mx[0], mn[1], mx[2]],
                     [mx[0], mx[1], mn[2]], [mx[0], mx[1], mx[2]]])


def get_bound_2d_mask(bounds, K, pose, H, W) -> np.ndarray:
    """Projected-3D-box raster mask (THuman_dataset.py:54-65)."""
    import cv2

    corners = get_bound_corners(bounds)
    xyz = corners @ pose[:, :3].T + pose[:, 3:].T
    xy = (xyz @ K.T)
    xy = np.round(xy[:, :2] / xy[:, 2:]).astype(int)
    mask = np.zeros((H, W), dtype=np.uint8)
    for face in ([0, 1, 3, 2, 0], [4, 5, 7, 6, 4], [0, 1, 5, 4, 0],
                 [2, 3, 7, 6, 2], [0, 2, 6, 4, 0], [1, 3, 7, 5, 1]):
        cv2.fillPoly(mask, [xy[face]], 1)
    return mask


def sample_rays_for_image(img, msk, K, R, T, bounds,
                          image_scaling: float = 1.0,
                          white_back: bool = False):
    """The shared sample_ray_*_batch pipeline.  Returns
    (img, ray_o, ray_d, near, far, mask_at_box, bkgd_msk)."""
    import cv2

    H, W = img.shape[:2]
    if image_scaling != 1.0:
        H, W = int(H * image_scaling), int(W * image_scaling)
        img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
        K = np.copy(K)
        K[:2, :3] = K[:2, :3] * image_scaling

    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bound_mask = get_bound_2d_mask(bounds, K, pose, H, W)

    msk = msk * bound_mask
    img = img.copy()
    img[bound_mask != 1] = 1.0 if white_back else 0.0

    # native fast path (sherf_tpu/native/host_ops.cpp), numpy fallback
    from sherf_tpu.native import prepare_rays_native

    native = prepare_rays_native(H, W, K, R, T, bounds)
    if native is not None:
        ray_o, ray_d, near, far, mask_at_box = native
    else:
        ray_o, ray_d = get_rays_np(H, W, K, R, T)
        ray_o = ray_o.reshape(-1, 3).astype(np.float32)
        ray_d = ray_d.reshape(-1, 3).astype(np.float32)
        near, far, mask_at_box = near_far_aabb_np(bounds, ray_o, ray_d)
    return img, ray_o, ray_d, near, far, mask_at_box, msk


def make_item(*, img, msk, K, R, T, world_bounds, params, vertices,
              obs_img, obs_K, obs_R, obs_T, obs_params, obs_vertices,
              t_params, t_vertices, t_world_bounds,
              image_scaling: float = 1.0, white_back: bool = False) -> Dict:
    """Assemble one standardized training/eval item (numpy, HWC images)."""
    img, ray_o, ray_d, near, far, mask_at_box, bkgd = sample_rays_for_image(
        img, msk, K, R, T, world_bounds, 1.0, white_back)
    return dict(
        img=img.astype(np.float32),
        ray_o=ray_o, ray_d=ray_d, near=near, far=far,
        mask_at_box=mask_at_box,
        bkgd_msk=(bkgd != 0).astype(np.float32).reshape(-1),
        params=params, vertices=vertices.astype(np.float32),
        obs_img=obs_img.astype(np.float32),
        obs_K=obs_K.astype(np.float32), obs_R=obs_R.astype(np.float32),
        obs_T=obs_T.reshape(3, 1).astype(np.float32),
        obs_params=obs_params, obs_vertices=obs_vertices.astype(np.float32),
        t_params=t_params, t_vertices=t_vertices.astype(np.float32),
        t_world_bounds=t_world_bounds.astype(np.float32),
    )


def _pose_from_params(params: Dict) -> Dict:
    return dict(
        poses=np.asarray(params["poses"], np.float32).reshape(72),
        shapes=np.asarray(params["shapes"], np.float32).reshape(-1)[:10],
        R=np.asarray(params["R"], np.float32).reshape(3, 3),
        Th=np.asarray(params["Th"], np.float32).reshape(3),
    )


def collate(items: Sequence[Dict]) -> SHERFBatch:
    """Stack per-item dicts into a device batch (jnp arrays, NHWC)."""
    import jax.numpy as jnp

    def stack(key):
        return jnp.asarray(np.stack([it[key] for it in items]))

    def stack_pose(key):
        ps = [_pose_from_params(it[key]) for it in items]
        return SMPLPose(
            poses=jnp.asarray(np.stack([p["poses"] for p in ps])),
            shapes=jnp.asarray(np.stack([p["shapes"] for p in ps])),
            R=jnp.asarray(np.stack([p["R"] for p in ps])),
            Th=jnp.asarray(np.stack([p["Th"] for p in ps])),
        )

    return SHERFBatch(
        t_pose=stack_pose("t_params"),
        t_vertices=stack("t_vertices"),
        t_bounds=stack("t_world_bounds"),
        pose=stack_pose("params"),
        vertices=stack("vertices"),
        img=stack("img"),
        ray_o=stack("ray_o"), ray_d=stack("ray_d"),
        near=stack("near"), far=stack("far"),
        mask_at_box=stack("mask_at_box"),
        bkgd_msk=stack("bkgd_msk"),
        obs_pose=stack_pose("obs_params"),
        obs_vertices=stack("obs_vertices"),
        obs_img=stack("obs_img"),
        obs_K=stack("obs_K"), obs_R=stack("obs_R"), obs_T=stack("obs_T"),
    )


class HumanDataset:
    """Base class: index -> (instance, pose, view) decomposition and the
    canonical big-pose setup shared by all four loaders."""

    camera_view_num: int = 1

    def __init__(self, data_root: str, smpl: SMPLModel, split: str = "train",
                 multi_person: bool = True, num_instance: int = 1,
                 poses_start: int = 0, poses_interval: int = 1,
                 poses_num: int = 20, image_scaling: float = 1.0,
                 white_back: bool = False, sample_obs_view: bool = False,
                 fix_obs_view: bool = True, seed: int = 0):
        self.data_root = data_root
        self.smpl = smpl
        self.split = split
        self.multi_person = multi_person
        self.num_instance = num_instance
        self.poses_start = poses_start
        self.poses_interval = poses_interval
        self.poses_num = poses_num
        self.image_scaling = image_scaling
        self.white_back = white_back
        self.sample_obs_view = sample_obs_view
        self.fix_obs_view = fix_obs_view
        self.rng = np.random.RandomState(seed)

        # eval protocols pin these (test_loop.py obs_pose_index/obs_view_index)
        self.obs_pose_index: Optional[int] = None
        self.obs_view_index: Optional[int] = None

        # canonical big pose (host smpl forward like each reference loader)
        self.big_pose = big_pose_params()
        t_vertices, _ = host_smpl_verts(smpl, self.big_pose["poses"],
                                        self.big_pose["shapes"])
        self.t_vertices = t_vertices.astype(np.float32)
        mn = self.t_vertices.min(0) - 0.05
        mx = self.t_vertices.max(0) + 0.05
        mn[2] -= 0.1
        mx[2] += 0.1
        self.t_world_bounds = np.stack([mn, mx])

    # -- shared index arithmetic (e.g. THuman_dataset.py:271-274)
    def _decompose(self, index):
        per_inst = self.poses_num * self.camera_view_num
        instance = index // per_inst if self.multi_person else 0
        pose = (index % per_inst) // self.camera_view_num
        view = index % self.camera_view_num
        return instance, pose, view

    def _obs_view(self) -> int:
        if self.obs_view_index is not None:
            return int(self.obs_view_index)
        if self.split == "train" and self.sample_obs_view:
            return int(self.rng.randint(self.camera_view_num))
        return self.default_obs_view

    def __len__(self):
        return self.num_instance * self.poses_num * self.camera_view_num
