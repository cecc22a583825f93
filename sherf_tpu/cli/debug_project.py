"""Debug: project SMPL vertices onto an image to visually verify
camera/SMPL alignment (the reference's render_hfz.py:1-53 pattern)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", default=None,
                   choices=[None, "renderpeople", "thuman", "humman", "zju"])
    p.add_argument("--data", default=None, help="subject dir (else synthetic)")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", default="debug_projection.png")
    p.add_argument("--smpl_model", default=None)
    a = p.parse_args(argv)

    import numpy as np
    import imageio.v2 as imageio

    from sherf_tpu.cli.common import resolve_smpl

    smpl = resolve_smpl(a.smpl_model)

    if a.data and a.cfg:
        from sherf_tpu.data import DATASETS

        ds = DATASETS[a.cfg](a.data, smpl, split="test", multi_person=False,
                             num_instance=1, poses_num=1)
        item = ds[a.index]
        img = item["obs_img"].copy()
        verts, K, R, T = (item["obs_vertices"], item["obs_K"],
                          item["obs_R"], item["obs_T"])
    else:
        from sherf_tpu.data import make_synthetic_batch

        batch = make_synthetic_batch(smpl, batch_size=1, H=256, W=256, seed=0)
        img = np.asarray(batch.obs_img[0]).copy()
        verts = np.asarray(batch.obs_vertices[0])
        K = np.asarray(batch.obs_K[0])
        R = np.asarray(batch.obs_R[0])
        T = np.asarray(batch.obs_T[0])

    cam = verts @ R.T + T.reshape(3)
    pix = cam @ K.T
    xy = (pix[:, :2] / np.maximum(pix[:, 2:], 1e-5)).astype(int)
    H, W = img.shape[:2]
    ok = (xy[:, 0] >= 0) & (xy[:, 0] < W) & (xy[:, 1] >= 0) & (xy[:, 1] < H)
    img[xy[ok, 1], xy[ok, 0]] = np.array([1.0, 0.0, 0.0])
    imageio.imwrite(a.out, (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f"projected {int(ok.sum())}/{len(verts)} vertices in frame -> {a.out}")


if __name__ == "__main__":
    main()
