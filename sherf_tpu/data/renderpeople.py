"""RenderPeople dataset pipeline (reference training/RenderPeople_dataset.py).

Layout per subject:
  cameras.json                         — {camera%04d: {K, R, T}} x36 views
  img/camera%04d/%04d.jpg              — RGB
  mask/camera%04d/%04d.png             — masks
  outputs_re_fitting/refit_smpl_2nd.npz — {'smpl': {betas, global_orient,
                                           body_pose, transl}} per pose
Vertices are produced by the host SMPL forward (prepare_input,
RenderPeople_dataset.py:206-220); global R is identity and Th = transl.
Quirk preserved: the big-pose params carry R = ones((3,3))
(RenderPeople_dataset.py:226) — never consumed by the warps.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from sherf_tpu.data.base import HumanDataset, make_item
from sherf_tpu.smpl.lbs import smpl_forward
from sherf_tpu.smpl.model import SMPLModel


class RenderPeopleDataset(HumanDataset):
    camera_view_num = 36
    default_obs_view = 0  # fix_obs_view (RenderPeople_dataset.py:311-312)

    def __init__(self, data_root: str, smpl: SMPLModel, **kw):
        super().__init__(data_root, smpl, **kw)
        # quirk: RenderPeople big-pose R is ones(3,3) (never consumed)
        self.big_pose = dict(self.big_pose)
        self.big_pose["R"] = np.ones((3, 3), np.float32)

        humans_root = os.path.dirname(data_root)
        if self.multi_person:
            with open(os.path.join(humans_root, "human_list.txt")) as f:
                names = [x.strip() for x in f.readlines()[: self.num_instance]]
            self.subjects = [os.path.join(humans_root, n) for n in names]
        else:
            self.subjects = [data_root]
        self.cams_all = [json.load(open(os.path.join(r, "cameras.json")))
                         for r in self.subjects]

    def _camera(self, cams, view):
        c = cams[f"camera{view:04d}"]
        K = np.array(c["K"], np.float32)
        R = np.array(c["R"], np.float32)
        T = np.array(c["T"], np.float32).reshape(3, 1)
        return K, R, T

    def _load_view(self, root, cams, pose_index, view_index):
        import cv2
        import imageio.v2 as imageio

        img_path = os.path.join(root, "img", f"camera{view_index:04d}",
                                f"{pose_index:04d}.jpg")
        msk_path = os.path.join(root, "mask", f"camera{view_index:04d}",
                                f"{pose_index:04d}.png")
        img = np.asarray(imageio.imread(img_path), np.float32) / 255.0
        msk = np.asarray(imageio.imread(msk_path))
        msk = (msk != 0).astype(np.float32)
        if msk.ndim == 3:
            msk = msk[..., 0]
        img = img.copy()
        img[msk == 0] = 1.0 if self.white_back else 0.0
        K, R, T = self._camera(cams, view_index)

        if self.image_scaling != 1.0:
            H, W = img.shape[:2]
            H, W = int(H * self.image_scaling), int(W * self.image_scaling)
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
            msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
            K = K.copy()
            K[:2] = K[:2] * self.image_scaling
        return img, msk, K, R, T

    def _smpl_params(self, root, pose_index) -> Dict:
        raw = dict(np.load(os.path.join(root, "outputs_re_fitting",
                                        "refit_smpl_2nd.npz"),
                           allow_pickle=True))["smpl"].item()
        poses = np.zeros(72, np.float32)
        poses[:3] = np.asarray(raw["global_orient"][pose_index], np.float32).reshape(3)
        poses[3:] = np.asarray(raw["body_pose"][pose_index], np.float32).reshape(69)
        return dict(
            poses=poses,
            shapes=np.asarray(raw["betas"], np.float32).reshape(-1)[:10],
            R=np.eye(3, dtype=np.float32),
            Th=np.asarray(raw["transl"][pose_index], np.float32).reshape(3),
        )

    def _load_smpl(self, root, pose_index):
        import jax.numpy as jnp

        from sherf_tpu.data.base import host_smpl_verts

        params = self._smpl_params(root, pose_index)
        xyz = host_smpl_verts(self.smpl, params["poses"],
                              params["shapes"])[0]
        verts = (xyz @ params["R"].T + params["Th"]).astype(np.float32)
        bounds = np.stack([verts.min(0) - 0.05, verts.max(0) + 0.05])
        return bounds, verts, params

    def __getitem__(self, index) -> Dict:
        inst, pose_rel, view_index = self._decompose(index)
        pose_index = pose_rel * self.poses_interval + self.poses_start
        root = self.subjects[inst]
        cams = self.cams_all[inst]

        img, msk, K, R, T = self._load_view(root, cams, pose_index, view_index)
        world_bounds, vertices, params = self._load_smpl(root, pose_index)

        obs_pose = (int(self.obs_pose_index) if self.obs_pose_index is not None
                    else pose_index)
        obs_view = self._obs_view()
        obs_img, _, oK, oR, oT = self._load_view(root, cams, obs_pose, obs_view)
        _, obs_vertices, obs_params = self._load_smpl(root, obs_pose)

        return make_item(
            img=img, msk=msk, K=K, R=R, T=T, world_bounds=world_bounds,
            params=params, vertices=vertices,
            obs_img=obs_img, obs_K=oK, obs_R=oR, obs_T=oT,
            obs_params=obs_params, obs_vertices=obs_vertices,
            t_params=self.big_pose, t_vertices=self.t_vertices,
            t_world_bounds=self.t_world_bounds, white_back=self.white_back)
