"""ADA AugmentPipe (reference training/augment.py; off by default in every
shipped SHERF config — these tests check the distributional semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sherf_tpu.features.augment import (
    AugmentPipe, ada_adjust, rotate2d, rotate3d, scale2d, translate2d)


def _imgs(B=8, H=16, W=16, C=3, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (B, H, W, C),
                              minval=-1.0, maxval=1.0)


def test_identity_when_all_off():
    x = _imgs()
    out = AugmentPipe()(x, jax.random.PRNGKey(1), p=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_identity_when_p_zero():
    x = _imgs()
    pipe = AugmentPipe(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                       aniso=1, xfrac=1, brightness=1, contrast=1,
                       lumaflip=1, hue=1, saturation=1, noise=1, cutout=1)
    out = pipe(x, jax.random.PRNGKey(1), p=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_xflip_is_exact_mirror():
    x = _imgs(B=64)
    out = np.asarray(AugmentPipe(xflip=1)(x, jax.random.PRNGKey(2), p=1.0))
    x = np.asarray(x)
    flipped = x[:, :, ::-1]
    is_id = np.array([np.allclose(out[i], x[i], atol=1e-4) for i in range(64)])
    is_fl = np.array([np.allclose(out[i], flipped[i], atol=1e-4)
                      for i in range(64)])
    assert (is_id | is_fl).all()
    # xflip=1, p=1 -> flip probability 0.5 (then uniform over {0,1})
    assert 10 < is_fl.sum() < 54


def test_rotate90_orbits():
    x = _imgs(B=32)
    out = np.asarray(AugmentPipe(rotate90=1)(x, jax.random.PRNGKey(3), p=1.0))
    x = np.asarray(x)
    ok = 0
    for i in range(32):
        cands = [x[i], np.rot90(x[i], 1), np.rot90(x[i], 2), np.rot90(x[i], 3)]
        ok += any(np.allclose(out[i], c, atol=1e-4) for c in cands)
    assert ok == 32


def test_brightness_shifts_mean():
    x = _imgs(B=128)
    pipe = AugmentPipe(brightness=1, brightness_std=0.5)
    out = np.asarray(pipe(x, jax.random.PRNGKey(4), p=1.0))
    d = (out - np.asarray(x)).reshape(128, -1)
    # brightness adds a per-image constant across all channels
    per_img_std = d.std(axis=1)
    shifted = np.abs(d.mean(axis=1)) > 1e-3
    assert shifted.sum() > 30
    assert (per_img_std[shifted] < 1e-3).all()


def test_noise_and_cutout():
    x = _imgs(B=4)
    out = np.asarray(AugmentPipe(noise=1)(x, jax.random.PRNGKey(5), p=1.0))
    assert not np.allclose(out, np.asarray(x))
    out = np.asarray(AugmentPipe(cutout=1)(x, jax.random.PRNGKey(6), p=1.0))
    # cutout zeroes a half-size rectangle: some exact zeros appear
    assert (out == 0).sum() > 4 * 16 * 16 * 3 * 0.1


def test_imgfilter_preserves_shape_and_energy():
    x = _imgs(B=16)
    pipe = AugmentPipe(imgfilter=1)
    out = np.asarray(pipe(x, jax.random.PRNGKey(7), p=1.0))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    e_in = float(np.mean(np.asarray(x) ** 2))
    e_out = float(np.mean(out ** 2))
    assert 0.3 < e_out / e_in < 3.0


def test_geometric_jit_compiles_once():
    pipe = AugmentPipe(scale=1, rotate=1, aniso=1, xfrac=1)
    f = jax.jit(lambda x, k, p: pipe(x, k, p))
    x = _imgs(B=2)
    o1 = f(x, jax.random.PRNGKey(8), 0.7)
    o2 = f(x, jax.random.PRNGKey(9), 0.2)  # p traced, not static
    assert o1.shape == x.shape and o2.shape == x.shape
    assert np.isfinite(np.asarray(o1)).all()


def test_matrix_helpers():
    t = translate2d(jnp.asarray([2.0]), jnp.asarray([3.0]))[0]
    np.testing.assert_allclose(t @ jnp.asarray([1.0, 1.0, 1.0]),
                               [3.0, 4.0, 1.0])
    r = rotate2d(jnp.asarray([np.pi / 2]))[0]
    np.testing.assert_allclose(r @ jnp.asarray([1.0, 0.0, 1.0]),
                               [0.0, 1.0, 1.0], atol=1e-6)
    s = scale2d(jnp.asarray([2.0]), jnp.asarray([0.5]))[0]
    np.testing.assert_allclose(jnp.diag(s), [2.0, 0.5, 1.0])
    # rotating about the luma axis keeps gray colors fixed
    ax = jnp.asarray([[1.0, 1.0, 1.0]])
    R = rotate3d(ax, jnp.asarray([1.0]))[0]
    gray = jnp.asarray([0.3, 0.3, 0.3, 1.0])
    np.testing.assert_allclose(R @ gray, gray, atol=1e-6)


def test_ada_adjust_direction():
    assert ada_adjust(0.5, rt=0.9, target=0.6, nimg_delta=4000) > 0.5
    assert ada_adjust(0.5, rt=0.3, target=0.6, nimg_delta=4000) < 0.5
    assert ada_adjust(0.0, rt=0.3, target=0.6, nimg_delta=4000) == 0.0
    assert ada_adjust(1.0, rt=0.9, target=0.6, nimg_delta=4000) == 1.0
