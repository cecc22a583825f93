"""THuman dataset pipeline (reference training/THuman_dataset.py).

Layout per subject directory:
  annots.npy                     — dict(cams={K,D,R,T}, ims=[{ims:[...]}, ...])
  <ims paths>                    — RGB jpgs, 24 views
  mask_cihp/<ims paths>.png      — person masks
  new_vertices/{i}.npy           — posed world vertices (6890, 3)
  new_params_neutral/{i}.npy     — dict(poses, shapes, R, Th)
Multi-person roots come from ../human_list.txt (first 90 = train split).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from sherf_tpu.data.base import HumanDataset, make_item
from sherf_tpu.smpl.model import SMPLModel


def _load_annots(subject_root: str):
    ann = np.load(os.path.join(subject_root, "annots.npy"),
                  allow_pickle=True).item()
    return ann["cams"], ann["ims"]


class THumanDataset(HumanDataset):
    camera_view_num = 24
    default_obs_view = 12  # fix_obs_view (THuman_dataset.py:339-340)

    def __init__(self, data_root: str, smpl: SMPLModel, **kw):
        super().__init__(data_root, smpl, **kw)
        humans_root = os.path.dirname(data_root)
        if self.multi_person:
            with open(os.path.join(humans_root, "human_list.txt")) as f:
                names = [x.strip() for x in f.readlines()[: self.num_instance]]
            self.subjects = [os.path.join(humans_root, n) for n in names]
        else:
            self.subjects = [data_root]

        self.cams_all, self.ims_all = [], []
        for root in self.subjects:
            cams, ims = _load_annots(root)
            sel = ims[self.poses_start:
                      self.poses_start + self.poses_num * self.poses_interval]
            sel = sel[:: self.poses_interval]
            self.cams_all.append(cams)
            self.ims_all.append(np.array([
                np.array(d["ims"])[: self.camera_view_num] for d in sel]))

    # ------------------------------------------------------------------
    def _load_view(self, root, cams, ims, pose_index, view_index):
        import cv2
        import imageio.v2 as imageio

        img_path = os.path.join(root, ims[pose_index][view_index].replace("\\", "/"))
        img = np.asarray(imageio.imread(img_path), np.float32) / 255.0
        msk_path = os.path.join(
            root, "mask_cihp",
            ims[pose_index][view_index].replace("\\", "/").replace("jpg", "png"))
        msk = np.asarray(imageio.imread(msk_path))
        msk = (msk != 0).astype(np.float32)
        if msk.ndim == 3:
            msk = msk[..., 0]
        img = img.copy()
        img[msk == 0] = 1.0 if self.white_back else 0.0

        K = np.array(cams["K"][view_index], np.float64)
        D = np.array(cams["D"][view_index], np.float64)
        R = np.array(cams["R"][view_index], np.float32)
        T = np.array(cams["T"][view_index], np.float32)
        img = cv2.undistort(img, K, D)
        msk = cv2.undistort(msk, K, D)

        if self.image_scaling != 1.0:
            H, W = img.shape[:2]
            H, W = int(H * self.image_scaling), int(W * self.image_scaling)
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
            msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
            K = K.copy()
            K[:2] = K[:2] * self.image_scaling
        frame_id = int(os.path.basename(img_path)[:-4])
        return img, msk, K.astype(np.float32), R, T, frame_id

    def _load_smpl(self, root, frame_id):
        verts = np.load(os.path.join(root, "new_vertices", f"{frame_id}.npy")
                        ).astype(np.float32)
        params = np.load(os.path.join(root, "new_params_neutral",
                                      f"{frame_id}.npy"), allow_pickle=True).item()
        params = dict(
            poses=np.asarray(params["poses"], np.float32).reshape(72),
            shapes=np.asarray(params["shapes"], np.float32).reshape(-1)[:10],
            R=np.asarray(params["R"], np.float32).reshape(3, 3),
            Th=np.asarray(params["Th"], np.float32).reshape(3),
        )
        bounds = np.stack([verts.min(0) - 0.05, verts.max(0) + 0.05])
        return bounds, verts, params

    # ------------------------------------------------------------------
    def __getitem__(self, index) -> Dict:
        inst, pose_index, view_index = self._decompose(index)
        root = self.subjects[inst]
        cams, ims = self.cams_all[inst], self.ims_all[inst]
        if pose_index >= len(ims):
            pose_index = int(self.rng.randint(len(ims)))

        img, msk, K, R, T, fid = self._load_view(root, cams, ims,
                                                 pose_index, view_index)
        world_bounds, vertices, params = self._load_smpl(root, fid)

        obs_pose = (int(self.obs_pose_index) if self.obs_pose_index is not None
                    else pose_index)
        obs_view = self._obs_view()
        obs_img, obs_msk, oK, oR, oT, ofid = self._load_view(
            root, cams, ims, obs_pose, obs_view)
        _, obs_vertices, obs_params = self._load_smpl(root, ofid)

        return make_item(
            img=img, msk=msk, K=K, R=R, T=T, world_bounds=world_bounds,
            params=params, vertices=vertices,
            obs_img=obs_img, obs_K=oK, obs_R=oR, obs_T=oT,
            obs_params=obs_params, obs_vertices=obs_vertices,
            t_params=self.big_pose, t_vertices=self.t_vertices,
            t_world_bounds=self.t_world_bounds, white_back=self.white_back)
