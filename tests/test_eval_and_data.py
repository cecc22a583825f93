"""Eval metrics (vs skimage-default formulas), GAN metric math, dataset
pipeline through an on-disk THuman-format fixture, and the eval protocol
driver end-to-end on that fixture."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sherf_tpu.eval.metrics import psnr_np, ssim_np
from sherf_tpu.eval.gan_metrics import (
    FeatureStats, frechet_distance, kernel_distance,
)
from sherf_tpu.smpl import synthetic_smpl, smpl_forward


def test_eval_defaults_match_reference_launch_values():
    """Pin EVAL_DEFAULTS to the reference's exact test(...) launch values
    (reference training_loop.py:321-327) and the hardcoded eval subject
    lists (test_loop.py:112-151)."""
    from sherf_tpu.core.config import EVAL_DEFAULTS, EVAL_SUBJECTS

    assert EVAL_DEFAULTS["renderpeople"] == dict(
        obs_views=(0, 16, 31), nv_pose_start=0, np_pose_start=2,
        pose_interval=2, pose_num=5)
    assert EVAL_DEFAULTS["thuman"] == dict(
        obs_views=(4, 12, 20), nv_pose_start=0, np_pose_start=0,
        pose_interval=2, pose_num=5)
    assert EVAL_DEFAULTS["humman"] == dict(
        obs_views=(0, 4, 8), nv_pose_start=0, np_pose_start=0,
        pose_interval=6, pose_num=17)
    assert EVAL_DEFAULTS["zju"] == dict(
        obs_views=(4, 10, 16), nv_pose_start=0, np_pose_start=0,
        pose_interval=20, pose_num=25)

    assert len(EVAL_SUBJECTS["humman"]) == 22
    assert EVAL_SUBJECTS["humman"][0] == "p000455_a000986"
    assert EVAL_SUBJECTS["humman"][-1] == "p100074_a000048"
    assert EVAL_SUBJECTS["zju"] == (
        "CoreView_377", "CoreView_313", "CoreView_315")


def test_humman_eval_subjects_resolve_without_flag(tmp_path):
    """cli/eval.py must not demand --subjects for humman (reference
    hardcodes the 22-subject list)."""
    import inspect
    from sherf_tpu.cli import eval as eval_cli

    src = inspect.getsource(eval_cli)
    assert "--subjects required" not in src
    assert "EVAL_SUBJECTS" in src


def test_psnr_basic():
    rng = np.random.RandomState(0)
    gt = rng.rand(16, 16, 3).astype(np.float32)
    mask = np.ones((16, 16), bool)
    assert psnr_np(gt, gt, mask) > 80
    noisy = np.clip(gt + 0.1, 0, 1)
    assert 15 < psnr_np(noisy, gt, mask) < 25


def test_ssim_np_identity_and_ordering():
    rng = np.random.RandomState(1)
    a = rng.rand(32, 32, 3)
    assert ssim_np(a, a) == pytest.approx(1.0, abs=1e-9)
    slightly = np.clip(a + rng.randn(32, 32, 3) * 0.02, 0, 1)
    very = np.clip(a + rng.randn(32, 32, 3) * 0.3, 0, 1)
    assert ssim_np(a, slightly) > ssim_np(a, very)


def test_ssim_np_matches_skimage_if_available():
    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        pytest.skip("skimage unavailable")
    rng = np.random.RandomState(2)
    a = rng.rand(24, 24, 3)
    b = rng.rand(24, 24, 3)
    ref = structural_similarity(a, b, channel_axis=-1, data_range=2.0)
    assert ssim_np(a, b) == pytest.approx(ref, abs=1e-6)


def test_fid_zero_for_identical_and_positive_for_shifted():
    rng = np.random.RandomState(3)
    f1 = rng.randn(500, 16)
    s1, s2 = FeatureStats(), FeatureStats()
    s1.append(f1)
    s2.append(f1)
    assert frechet_distance(*s1.get_mean_cov(), *s2.get_mean_cov()) == \
        pytest.approx(0.0, abs=1e-6)
    s3 = FeatureStats()
    s3.append(f1 + 2.0)
    assert frechet_distance(*s1.get_mean_cov(), *s3.get_mean_cov()) > 1.0


def test_kid_ordering():
    rng = np.random.RandomState(4)
    f1 = rng.randn(300, 8)
    f2 = rng.randn(300, 8)
    f3 = rng.randn(300, 8) + 1.5
    same = kernel_distance(f1, f2, num_subsets=10, max_subset_size=100)
    diff = kernel_distance(f1, f3, num_subsets=10, max_subset_size=100)
    assert diff > same


# ---------------------------------------------------------------------------
# THuman-format fixture -> loader -> collate -> (tiny) eval protocol


@pytest.fixture(scope="module")
def thuman_fixture(tmp_path_factory):
    import cv2
    import imageio.v2 as imageio

    from sherf_tpu.data.synthetic import synthetic_camera
    from sherf_tpu.smpl.lbs import big_pose_params

    root = tmp_path_factory.mktemp("thuman") / "subject00"
    os.makedirs(root)
    smpl = synthetic_smpl(0)
    rng = np.random.RandomState(0)

    n_views, n_poses, H, W = 3, 2, 48, 48
    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in range(n_views):
        K, R, T = synthetic_camera(H, W, rng)
        cams["K"].append(K.astype(np.float64))
        cams["D"].append(np.zeros(5))
        cams["R"].append(R.astype(np.float64))
        cams["T"].append(T.astype(np.float64))

    os.makedirs(root / "new_vertices")
    os.makedirs(root / "new_params_neutral")
    for v in range(n_views):
        os.makedirs(root / f"view{v}")
        os.makedirs(root / "mask_cihp" / f"view{v}")

    ims = []
    for pidx in range(n_poses):
        pose = (rng.randn(72) * 0.2).astype(np.float32)
        shape = (rng.randn(10) * 0.2).astype(np.float32)
        verts = np.asarray(smpl_forward(smpl, jnp.asarray(pose),
                                        jnp.asarray(shape))[0])
        np.save(root / "new_vertices" / f"{pidx}.npy", verts)
        np.save(root / "new_params_neutral" / f"{pidx}.npy",
                dict(poses=pose.reshape(1, 72), shapes=shape.reshape(1, 10),
                     R=np.eye(3, dtype=np.float32),
                     Th=np.zeros((1, 3), np.float32)))
        row = []
        for v in range(n_views):
            # reference layout: per-view dirs, numeric pose-id basenames
            name = f"view{v}/{pidx}.jpg"
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            imageio.imwrite(root / name, img)
            msk = np.zeros((H, W), np.uint8)
            msk[8:40, 8:40] = 255
            imageio.imwrite(str(root / "mask_cihp" / name)[:-4] + ".png", msk)
            row.append(name)
        ims.append({"ims": row})

    np.save(root / "annots.npy", {"cams": cams, "ims": ims})
    return str(root), smpl


def test_thuman_loader_and_collate(thuman_fixture):
    root, smpl = thuman_fixture
    from sherf_tpu.data import THumanDataset, collate

    ds = THumanDataset(root, smpl, split="test", multi_person=False,
                       num_instance=1, poses_num=2)
    ds.camera_view_num = 3  # fixture has 3 views
    ds.obs_view_index = 1
    item = ds[0]
    assert item["img"].shape[2] == 3
    assert item["ray_o"].shape == item["ray_d"].shape
    assert item["near"].shape == item["far"].shape
    batch = collate([item, ds[1]])
    assert batch.img.shape[0] == 2
    assert batch.obs_K.shape == (2, 3, 3)


def test_multisubject_synthetic_dataset():
    """Multi-person mode (reference RenderPeople 450-subject training,
    RenderPeople_dataset.py:151-175): subject identity is deterministic in
    the GLOBAL subject id (shape, appearance phase, canonical body), items
    of one subject share it across poses/views, and a held-out subject id
    is genuinely disjoint from the train split."""
    from sherf_tpu.data.base import collate
    from sherf_tpu.data.synthetic import SyntheticDataset

    smpl = synthetic_smpl(0)
    ds = SyntheticDataset(smpl, H=16, W=16, size=64, seed=1, subjects=3)
    held = SyntheticDataset(smpl, H=16, W=16, size=4, seed=2, subjects=1,
                            subject_offset=100)

    # same subject, different items: same shape + canonical body,
    # different pose/cameras
    a, b = ds[0], ds[3]
    np.testing.assert_array_equal(a["params"]["shapes"],
                                  b["params"]["shapes"])
    np.testing.assert_array_equal(a["t_vertices"], b["t_vertices"])
    assert np.abs(a["params"]["poses"] - b["params"]["poses"]).max() > 1e-3
    # canonical body reflects the SUBJECT shape (differs across subjects)
    c = ds[1]
    assert np.abs(a["t_vertices"] - c["t_vertices"]).max() > 1e-4
    assert np.abs(a["params"]["shapes"] - c["params"]["shapes"]).max() > 1e-3

    # identity is global: the same sid from ANOTHER dataset/seed matches
    ds2 = SyntheticDataset(smpl, H=16, W=16, size=8, seed=9, subjects=3)
    np.testing.assert_array_equal(ds.subject_identity(2)[0],
                                  ds2.subject_identity(2)[0])

    # held-out subject is none of the train subjects
    h = held[0]
    for s in range(3):
        assert np.abs(h["params"]["shapes"]
                      - ds.subject_identity(s)[0]).max() > 1e-3

    # appearance is view-consistent per subject: obs and target splats use
    # the subject phase (nonzero pixels drawn from the same color set)
    batch = collate([a, c])
    assert batch.img.shape == (2, 16, 16, 3)
    assert batch.t_vertices.shape == (2, 6890, 3)
