"""LPIPS torch-oracle test with synthetic weights (VERDICT r1 weak #6: the
LPIPS path had never executed numerically — no lpips/torchvision in env).

Builds a random-weight torch state_dict in the lpips package's exact naming
(net.sliceN.<tv_idx>.weight/bias + lins.i.model.1.weight), imports it
through train/lpips.py, and compares the flax LPIPS against a test-local
torch implementation of the same computation (VGG16-D conv stack, stage
taps at relu1_2/2_2/3_3/4_3/5_3, unit-normalize, squared diff, 1x1 linear,
spatial mean, stage sum)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from sherf_tpu.train.lpips import (  # noqa: E402
    LPIPS, _SHIFT, _SCALE, _VGG_CFG, _STAGE_ENDS, import_lpips_state_dict,
    load_lpips_file,
)

# torchvision vgg16.features indices of conv layers, and the slice each
# belongs to in the lpips package (slice1: 0-3, slice2: 4-8, slice3: 9-15,
# slice4: 16-22, slice5: 23-29)
_TV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def _slice_of(tv_idx):
    for n, hi in ((1, 4), (2, 9), (3, 16), (4, 23), (5, 30)):
        if tv_idx < hi:
            return n
    raise AssertionError


def _synthetic_sd(rng):
    sd = {}
    cin = 3
    ci = 0
    chans = []
    for v in _VGG_CFG:
        if v == "M":
            continue
        sd[f"net.slice{_slice_of(_TV_IDX[ci])}.{_TV_IDX[ci]}.weight"] = \
            (rng.randn(v, cin, 3, 3) * 0.05).astype(np.float32)
        sd[f"net.slice{_slice_of(_TV_IDX[ci])}.{_TV_IDX[ci]}.bias"] = \
            (rng.randn(v) * 0.05).astype(np.float32)
        chans.append(v)
        cin = v
        ci += 1
    for i, stage_ci in enumerate(_STAGE_ENDS):
        sd[f"lins.{i}.model.1.weight"] = np.abs(
            rng.randn(1, chans[stage_ci], 1, 1).astype(np.float32))
    return sd


def _torch_lpips(sd, x, y):
    """Test-local torch oracle of the lpips computation."""
    def vgg_feats(img):
        z = (img - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / \
            torch.tensor(_SCALE).view(1, 3, 1, 1)
        feats = []
        ci = 0
        for v in _VGG_CFG:
            if v == "M":
                z = F.max_pool2d(z, 2, 2)
                continue
            w = torch.from_numpy(
                sd[f"net.slice{_slice_of(_TV_IDX[ci])}.{_TV_IDX[ci]}.weight"])
            b = torch.from_numpy(
                sd[f"net.slice{_slice_of(_TV_IDX[ci])}.{_TV_IDX[ci]}.bias"])
            z = F.relu(F.conv2d(z, w, b, padding=1))
            if ci in _STAGE_ENDS:
                feats.append(z)
            ci += 1
        return feats

    fx, fy = vgg_feats(x), vgg_feats(y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        w = torch.from_numpy(sd[f"lins.{i}.model.1.weight"])
        total = total + F.conv2d(d, w).mean(dim=(2, 3))
    return total[:, 0]


def test_lpips_matches_torch_oracle():
    rng = np.random.RandomState(0)
    sd = _synthetic_sd(rng)
    params = import_lpips_state_dict(sd)

    x = rng.rand(2, 33, 31, 3).astype(np.float32) * 2 - 1
    y = np.clip(x + rng.randn(2, 33, 31, 3).astype(np.float32) * 0.2, -1, 1)

    ours = np.asarray(LPIPS().apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(y)))
    ref = _torch_lpips(sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                       torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    assert (ours > 0).all()

    # identical inputs -> exactly zero distance
    zero = np.asarray(LPIPS().apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-7)


def test_lpips_file_loader_roundtrip(tmp_path):
    """The no-egress weight path: torch.save'd state_dict -> loader."""
    rng = np.random.RandomState(1)
    sd = _synthetic_sd(rng)
    path = str(tmp_path / "lpips_vgg.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    params = load_lpips_file(path)
    assert params is not None
    direct = import_lpips_state_dict(sd)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(direct),
                   key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.heavy
def test_lpips_gradient_flows():
    """The training loss path differentiates through LPIPS; pin that the
    gradient is finite and nonzero (loss.py:160 equivalent)."""
    rng = np.random.RandomState(2)
    params = import_lpips_state_dict(_synthetic_sd(rng))
    y = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32) * 2 - 1)
    x0 = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32) * 2 - 1)

    g = jax.grad(lambda x: LPIPS().apply({"params": params}, x, y).sum())(x0)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0
