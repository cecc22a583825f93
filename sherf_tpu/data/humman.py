"""HuMMan dataset pipeline (reference training/HuMMan_dataset.py).

Layout per subject (mobile-capture, 10 kinect views, native 1920x1080,
shipped configs render at 1/3 scale => 640x360 non-square):
  cameras.json                          — {kinect_color_%03d: {K, R, T}}
  kinect_color/kinect_%03d/%06d.png     — RGB
  kinect_mask/kinect_%03d/%06d.png      — masks
  smpl_params/%06d.npz                  — betas, body_pose, global_orient, transl
Quirks preserved: global orientation goes into R (not poses[:3]); Th is
corrected by the pelvis shift (HuMMan_dataset.py:227-234).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from sherf_tpu.data.base import HumanDataset, make_item
from sherf_tpu.smpl.lbs import smpl_forward
from sherf_tpu.smpl.model import SMPLModel


class HuMManDataset(HumanDataset):
    camera_view_num = 10
    default_obs_view = 0

    def __init__(self, data_root: str, smpl: SMPLModel, **kw):
        kw.setdefault("image_scaling", 1.0 / 3.0)
        super().__init__(data_root, smpl, **kw)
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
        c = cams[f"kinect_color_{view:03d}"]
        return (np.array(c["K"], np.float32), np.array(c["R"], np.float32),
                np.array(c["T"], np.float32).reshape(3, 1))

    def _load_view(self, root, cams, pose_index, view_index):
        import cv2
        import imageio.v2 as imageio

        img_path = os.path.join(root, "kinect_color", f"kinect_{view_index:03d}",
                                f"{pose_index:06d}.png")
        msk_path = os.path.join(root, "kinect_mask", f"kinect_{view_index:03d}",
                                f"{pose_index:06d}.png")
        img = np.asarray(imageio.imread(img_path), np.float32)[..., :3] / 255.0
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

    def _load_smpl(self, root, pose_index):
        import cv2
        import jax.numpy as jnp

        raw = np.load(os.path.join(root, "smpl_params", f"{pose_index:06d}.npz"))
        poses = np.zeros(72, np.float32)
        poses[3:] = np.asarray(raw["body_pose"], np.float32).reshape(69)
        R = cv2.Rodrigues(np.asarray(raw["global_orient"], np.float64))[0]
        params = dict(
            poses=poses,
            shapes=np.asarray(raw["betas"], np.float32).reshape(-1)[:10],
            R=R.astype(np.float32),
            Th=np.asarray(raw["transl"], np.float32).reshape(3),
        )
        from sherf_tpu.data.base import host_smpl_verts

        xyz, joints = host_smpl_verts(self.smpl, params["poses"],
                                      params["shapes"])
        # pelvis-shift correction of Th (HuMMan_dataset.py:227-234)
        pelvis_shift = joints[:1] - joints[:1] @ params["R"].T
        params["Th"] = (params["Th"] + pelvis_shift.reshape(3)).astype(np.float32)
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
