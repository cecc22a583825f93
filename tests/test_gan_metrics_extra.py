"""PPL / IS / equivariance aggregates + ImageFolderDataset/dataset_tool
(reference metrics/{perceptual_path_length,inception_score,equivariance}.py
and dataset_tool.py)."""

import json
import os
import zipfile

import numpy as np

from sherf_tpu.eval.gan_metrics import (
    equivariance_psnr, inception_score, perceptual_path_length, slerp)


def test_slerp_endpoints_and_norm():
    rng = np.random.RandomState(0)
    a, b = rng.randn(4, 16), rng.randn(4, 16)
    s0 = slerp(a, b, 0.0)
    s1 = slerp(a, b, 1.0)
    np.testing.assert_allclose(s0, a / np.linalg.norm(a, axis=-1,
                                                      keepdims=True),
                               atol=1e-6)
    np.testing.assert_allclose(s1, b / np.linalg.norm(b, axis=-1,
                                                      keepdims=True),
                               atol=1e-6)
    mid = slerp(a, b, 0.5)
    np.testing.assert_allclose(np.linalg.norm(mid, axis=-1), 1.0, atol=1e-6)


def test_ppl_scaling_and_clipping():
    d = np.full(100, 2e-8)
    # distance / eps^2 with eps=1e-4 -> 2.0
    assert abs(perceptual_path_length(d, epsilon=1e-4) - 2.0) < 1e-6
    # an extreme outlier is clipped out by the 1/99 percentile filter
    d2 = np.concatenate([np.full(200, 2e-8), [1.0]])
    assert abs(perceptual_path_length(d2, epsilon=1e-4) - 2.0) < 1e-6


def test_inception_score_bounds():
    rng = np.random.RandomState(1)
    # confident, diverse classifier -> high IS
    onehot = np.eye(10)[rng.randint(10, size=500)] * 0.97 + 0.003
    onehot /= onehot.sum(1, keepdims=True)
    hi, _ = inception_score(onehot)
    # uniform classifier -> IS == 1
    uni = np.full((500, 10), 0.1)
    lo, std = inception_score(uni)
    assert hi > 5.0
    assert abs(lo - 1.0) < 1e-6 and std < 1e-6


def test_equivariance_psnr():
    rng = np.random.RandomState(2)
    img = rng.uniform(-1, 1, (16, 16, 3))
    assert equivariance_psnr(img, img) > 100
    noisy = img + rng.normal(0, 0.1, img.shape)
    v = equivariance_psnr(img, noisy)
    assert 20 < v < 40
    # mask excludes a corrupted region
    bad = img.copy()
    bad[:8] = 0
    mask = np.zeros(img.shape, bool)
    mask[8:] = True
    assert equivariance_psnr(img, bad, mask) > 100


def _make_folder(tmp_path, n=6, size=32):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    d = tmp_path / "imgs"
    os.makedirs(d)
    for i in range(n):
        imageio.imwrite(str(d / f"f{i}.png"),
                        rng.randint(0, 255, (size, size, 3), dtype=np.uint8))
    with open(d / "dataset.json", "w") as f:
        json.dump({"labels": [[f"f{i}.png", i % 3] for i in range(n)]}, f)
    return str(d)


def test_image_folder_dataset(tmp_path):
    from sherf_tpu.data.image_folder import ImageFolderDataset

    path = _make_folder(tmp_path)
    ds = ImageFolderDataset(path, use_labels=True)
    assert len(ds) == 6
    img, label = ds[1]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert label.shape == (3,) and label[1] == 1.0
    # xflip doubles the dataset and mirrors the second half
    dsx = ImageFolderDataset(path, xflip=True)
    assert len(dsx) == 12
    np.testing.assert_array_equal(dsx[6 + 1][0], dsx[1][0][:, ::-1])


def test_dataset_tool_roundtrip(tmp_path):
    from sherf_tpu.cli.dataset_tool import main as pack
    from sherf_tpu.data.image_folder import ImageFolderDataset

    src = _make_folder(tmp_path, n=5, size=48)
    dest = str(tmp_path / "packed.zip")
    pack(["--source", src, "--dest", dest,
          "--resolution", "32x32", "--transform", "center-crop"])
    assert zipfile.ZipFile(dest).testzip() is None
    ds = ImageFolderDataset(dest, use_labels=True)
    assert len(ds) == 5
    img, label = ds[0]
    assert img.shape == (32, 32, 3)
    assert label.shape == (3,)
    names = zipfile.ZipFile(dest).namelist()
    assert "dataset.json" in names and "img00000000.png" in names
