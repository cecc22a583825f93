"""On-disk layout fixtures for the RenderPeople / HuMMan / ZJU-MoCap
loaders (VERDICT r1 #7/#9: only THuman had one — tests/test_eval_and_data.py).

Each fixture writes a synthetic subject directory in the reference's exact
layout (files, naming, units, npz schemas) and drives the real
``__getitem__`` through it, pinning the loader quirks:
  RenderPeople — refit_smpl_2nd.npz smpl-dict schema, big-pose R=ones(3,3)
    (RenderPeople_dataset.py:226)
  HuMMan — kinect dirs, per-frame smpl_params npz, global_orient -> R with
    pelvis-shift-corrected Th (HuMMan_dataset.py:223-234), non-square scale
  ZJU — annots.npy cams/ims, mm -> m T scaling, Rh -> R, and the
    CoreView_313/315 filename remap (NeuBody_dataset.py:198-200)
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from sherf_tpu.data import collate
from sherf_tpu.data.synthetic import synthetic_camera
from sherf_tpu.smpl import smpl_forward, synthetic_smpl

H = W = 48
N_VIEWS, N_POSES = 3, 2


def _pose_shape(rng):
    return ((rng.randn(72) * 0.2).astype(np.float32),
            (rng.randn(10) * 0.2).astype(np.float32))


def _write_img_mask(imageio, img_path, msk_path, rng):
    os.makedirs(os.path.dirname(img_path), exist_ok=True)
    os.makedirs(os.path.dirname(msk_path), exist_ok=True)
    imageio.imwrite(img_path, (rng.rand(H, W, 3) * 255).astype(np.uint8))
    msk = np.zeros((H, W), np.uint8)
    msk[8:40, 8:40] = 255
    imageio.imwrite(msk_path, msk)


def _check_item(item):
    assert item["img"].shape[2] == 3
    assert item["ray_o"].shape == item["ray_d"].shape
    assert item["near"].shape == item["far"].shape
    assert np.isfinite(item["vertices"]).all()
    assert np.isfinite(item["obs_vertices"]).all()


# ---------------------------------------------------------------------------
# RenderPeople


@pytest.fixture(scope="module")
def renderpeople_fixture(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("rp") / "subject_0000"
    os.makedirs(root)
    rng = np.random.RandomState(0)

    cams = {}
    for v in range(N_VIEWS):
        K, R, T = synthetic_camera(H, W, rng)
        cams[f"camera{v:04d}"] = {"K": K.tolist(), "R": R.tolist(),
                                  "T": T.reshape(3).tolist()}
    import json
    with open(root / "cameras.json", "w") as f:
        json.dump(cams, f)

    go = (rng.randn(N_POSES, 3) * 0.1).astype(np.float32)
    bp = (rng.randn(N_POSES, 69) * 0.2).astype(np.float32)
    tr = (rng.randn(N_POSES, 3) * 0.05).astype(np.float32)
    betas = (rng.randn(10) * 0.2).astype(np.float32)
    os.makedirs(root / "outputs_re_fitting")
    np.savez(root / "outputs_re_fitting" / "refit_smpl_2nd.npz",
             smpl=dict(betas=betas, global_orient=go, body_pose=bp, transl=tr))

    for p in range(N_POSES):
        for v in range(N_VIEWS):
            _write_img_mask(
                imageio,
                str(root / "img" / f"camera{v:04d}" / f"{p:04d}.jpg"),
                str(root / "mask" / f"camera{v:04d}" / f"{p:04d}.png"), rng)
    return str(root), synthetic_smpl(0), tr


def test_renderpeople_loader(renderpeople_fixture):
    root, smpl, transl = renderpeople_fixture
    from sherf_tpu.data import RenderPeopleDataset

    ds = RenderPeopleDataset(root, smpl, split="test", multi_person=False,
                             num_instance=1, poses_num=N_POSES)
    ds.camera_view_num = N_VIEWS
    ds.obs_view_index = 2
    item = ds[0]
    _check_item(item)
    # quirk: big-pose R is ones(3,3) (RenderPeople_dataset.py:226)
    np.testing.assert_array_equal(np.asarray(item["t_params"]["R"]),
                                  np.ones((3, 3), np.float32))
    # R identity, Th = transl for this dataset's params
    np.testing.assert_array_equal(np.asarray(item["params"]["R"]), np.eye(3))
    np.testing.assert_allclose(np.asarray(item["params"]["Th"]), transl[0],
                               atol=1e-6)
    batch = collate([item, ds[1]])
    assert batch.img.shape[0] == 2 and batch.obs_K.shape == (2, 3, 3)


# ---------------------------------------------------------------------------
# HuMMan


@pytest.fixture(scope="module")
def humman_fixture(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("humman") / "p000001_a000001"
    os.makedirs(root)
    rng = np.random.RandomState(1)

    cams = {}
    for v in range(N_VIEWS):
        K, R, T = synthetic_camera(H, W, rng)
        cams[f"kinect_color_{v:03d}"] = {"K": K.tolist(), "R": R.tolist(),
                                         "T": T.reshape(3).tolist()}
    import json
    with open(root / "cameras.json", "w") as f:
        json.dump(cams, f)

    os.makedirs(root / "smpl_params")
    transls = []
    for p in range(N_POSES):
        go = (rng.randn(3) * 0.3).astype(np.float32)
        bp = (rng.randn(69) * 0.2).astype(np.float32)
        tl = (rng.randn(3) * 0.05).astype(np.float32)
        transls.append(tl)
        np.savez(root / "smpl_params" / f"{p:06d}.npz",
                 betas=(rng.randn(10) * 0.2).astype(np.float32),
                 body_pose=bp, global_orient=go, transl=tl)
        for v in range(N_VIEWS):
            _write_img_mask(
                imageio,
                str(root / "kinect_color" / f"kinect_{v:03d}" / f"{p:06d}.png"),
                str(root / "kinect_mask" / f"kinect_{v:03d}" / f"{p:06d}.png"),
                rng)
    return str(root), synthetic_smpl(0), transls


def test_humman_loader(humman_fixture):
    root, smpl, transls = humman_fixture
    from sherf_tpu.data import HuMManDataset

    # exercise the non-unity scaling path (shipped config: 1/3 of 1920x1080)
    ds = HuMManDataset(root, smpl, split="test", multi_person=False,
                       num_instance=1, poses_num=N_POSES, image_scaling=0.5)
    ds.camera_view_num = N_VIEWS
    ds.obs_view_index = 0
    item = ds[0]
    _check_item(item)
    assert item["img"].shape[:2] == (H // 2, W // 2)
    # global orientation lives in R, not poses[:3] (HuMMan_dataset.py:223)
    assert np.allclose(np.asarray(item["params"]["poses"])[:3], 0.0)
    assert not np.allclose(np.asarray(item["params"]["R"]), np.eye(3))
    # pelvis-shift correction moved Th off the raw transl (:227-234)
    assert not np.allclose(np.asarray(item["params"]["Th"]), transls[0],
                           atol=1e-5)
    batch = collate([item, ds[1]])
    assert batch.img.shape == (2, H // 2, W // 2, 3)


# ---------------------------------------------------------------------------
# ZJU-MoCap (incl. the CoreView_313 filename remap)


@pytest.fixture(scope="module")
def zju_fixture(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("zju") / "CoreView_313"
    os.makedirs(root)
    smpl = synthetic_smpl(0)
    rng = np.random.RandomState(2)

    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in range(N_VIEWS):
        K, R, T = synthetic_camera(H, W, rng)
        cams["K"].append(K.astype(np.float64))
        cams["D"].append(np.zeros((5, 1)))
        cams["R"].append(R.astype(np.float64))
        cams["T"].append(T.astype(np.float64) * 1000.0)  # annots carry mm

    os.makedirs(root / "new_vertices")
    os.makedirs(root / "new_params")
    ims = []
    for p in range(N_POSES):
        fid = p + 1
        poses, shapes = _pose_shape(rng)
        Rh = (rng.randn(3) * 0.2).astype(np.float32)
        Th = (rng.randn(1, 3) * 0.05).astype(np.float32)
        import cv2
        Rm = cv2.Rodrigues(Rh.astype(np.float64))[0]
        verts = np.asarray(smpl_forward(smpl, jnp.asarray(poses),
                                        jnp.asarray(shapes))[0])
        verts = (verts @ Rm.T + Th).astype(np.float32)
        np.save(root / "new_vertices" / f"{fid}.npy", verts)
        np.save(root / "new_params" / f"{fid}.npy",
                dict(poses=poses.reshape(1, 72), shapes=shapes.reshape(1, 10),
                     Rh=Rh.reshape(1, 3), Th=Th))
        row = []
        for v in range(N_VIEWS):
            # the RAW 313 annots names (remapped by the loader,
            # NeuBody_dataset.py:198-200) -> 'Camera (v+1)/<fid 04d>.jpg'
            raw = (f"Camera ({v + 1})/CoreView_313_Camera_({v + 1})"
                   f"_{fid:04d}_2019-08-23_16-08-50.592.jpg")
            row.append(raw)
            _write_img_mask(
                imageio,
                str(root / f"Camera ({v + 1})" / f"{fid:04d}.jpg"),
                str(root / "mask_cihp" / f"Camera ({v + 1})" / f"{fid:04d}.png"),
                rng)
        ims.append({"ims": row})
    np.save(root / "annots.npy", {"cams": cams, "ims": ims})
    return str(root), smpl


def test_zju_loader_with_313_remap(zju_fixture):
    root, smpl = zju_fixture
    from sherf_tpu.data import ZJUMoCapDataset

    # the ctor slices annots by camera_view_num, so size it to the fixture
    class _ZJU3(ZJUMoCapDataset):
        camera_view_num = N_VIEWS

    ds = _ZJU3(root, smpl, split="test", multi_person=False,
               num_instance=1, poses_num=N_POSES, image_scaling=1.0)
    ds.obs_view_index = 1
    item = ds[0]
    _check_item(item)
    # the remap stripped the long 313 name down to 'Camera (1)/0001.jpg'
    assert ds.ims_all[0][0][0] == "Camera (1)/0001.jpg"
    # T converted from mm to m: posed vertices stay body-scale (~meters)
    assert np.abs(np.asarray(item["vertices"])).max() < 10.0
    # Rh -> R rotation applied to params
    assert not np.allclose(np.asarray(item["params"]["R"]), np.eye(3))
    batch = collate([item, ds[1]])
    assert batch.img.shape == (2, H, W, 3)
