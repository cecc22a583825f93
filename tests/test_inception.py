"""InceptionV3 metric detector: torch block oracles + importer golden test.

The reference GAN metrics are defined by the TF inception-2015-12-05
detector (frechet_inception_distance.py:23-24).  Weights cannot be fetched
here, so these tests (a) pin every block's math against test-local torch
implementations with shared random weights, and (b) golden-test the torch
state_dict importer round-trip (VERDICT r1 next-step #6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from sherf_tpu.features.inception import (  # noqa: E402
    BasicConv2d, InceptionA, InceptionC, InceptionE, InceptionV3,
    _avg_pool_3x3_tf, import_inception_state_dict, inception_extractor,
    BN_EPS,
)


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32) * 0.1


def _torch_basic_conv(x_nchw, p, stride=1, padding=0):
    """torch oracle of BasicConv2d from our flax params (HWIO kernel)."""
    w = torch.from_numpy(np.transpose(np.asarray(p["conv"]), (3, 2, 0, 1)))
    y = F.conv2d(x_nchw, w, stride=stride, padding=padding)
    y = F.batch_norm(y, torch.from_numpy(np.asarray(p["bn_mean"])),
                     torch.from_numpy(np.asarray(p["bn_var"])),
                     torch.from_numpy(np.asarray(p["bn_scale"])),
                     torch.from_numpy(np.asarray(p["bn_bias"])),
                     training=False, eps=BN_EPS)
    return F.relu(y)


def _to_nchw(x):
    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def _to_nhwc(y):
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_basic_conv2d_matches_torch():
    rng = np.random.RandomState(0)
    x = _rand(rng, 2, 9, 9, 5)
    mod = BasicConv2d(7, (3, 3), stride=2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(lambda p: jnp.asarray(_rand(rng, *p.shape)), params)
    params = dict(params, bn_var=jnp.abs(params["bn_var"]) + 0.5)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    ref = _to_nhwc(_torch_basic_conv(_to_nchw(x),
                                     jax.tree.map(np.asarray, params),
                                     stride=2, padding=0))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_tf_avg_pool_matches_torch_count_exclude_pad():
    rng = np.random.RandomState(1)
    x = _rand(rng, 2, 11, 11, 3)
    ours = np.asarray(_avg_pool_3x3_tf(jnp.asarray(x)))
    ref = _to_nhwc(F.avg_pool2d(_to_nchw(x), 3, stride=1, padding=1,
                                count_include_pad=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def _randomize(params, rng):
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.asarray(
            np.abs(_rand(rng, *p.shape)) + 0.5
            if str(path[-1].key) == "bn_var" else _rand(rng, *p.shape)),
        params)
    return params


@pytest.mark.heavy
def test_inception_a_matches_torch():
    """Full InceptionA block vs a test-local torch implementation
    (torchvision graph + pytorch-fid count_include_pad=False patch)."""
    rng = np.random.RandomState(2)
    x = _rand(rng, 1, 12, 12, 16)
    mod = InceptionA(pool_features=8)
    params = _randomize(mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"],
                        rng)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, params)
    xt = _to_nchw(x)
    b1 = _torch_basic_conv(xt, p["branch1x1"])
    b5 = _torch_basic_conv(xt, p["branch5x5_1"])
    b5 = _torch_basic_conv(b5, p["branch5x5_2"], padding=2)
    b3 = _torch_basic_conv(xt, p["branch3x3dbl_1"])
    b3 = _torch_basic_conv(b3, p["branch3x3dbl_2"], padding=1)
    b3 = _torch_basic_conv(b3, p["branch3x3dbl_3"], padding=1)
    bp = F.avg_pool2d(xt, 3, stride=1, padding=1, count_include_pad=False)
    bp = _torch_basic_conv(bp, p["branch_pool"])
    ref = _to_nhwc(torch.cat([b1, b5, b3, bp], dim=1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_inception_c_matches_torch():
    """Factorized-7x7 block: asymmetric kernels + paddings."""
    rng = np.random.RandomState(3)
    x = _rand(rng, 1, 10, 10, 24)
    mod = InceptionC(channels_7x7=12)
    params = _randomize(mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"],
                        rng)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, params)
    xt = _to_nchw(x)
    b1 = _torch_basic_conv(xt, p["branch1x1"])
    b7 = _torch_basic_conv(xt, p["branch7x7_1"])
    b7 = _torch_basic_conv(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = _torch_basic_conv(b7, p["branch7x7_3"], padding=(3, 0))
    bd = _torch_basic_conv(xt, p["branch7x7dbl_1"])
    bd = _torch_basic_conv(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = _torch_basic_conv(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = _torch_basic_conv(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = _torch_basic_conv(bd, p["branch7x7dbl_5"], padding=(0, 3))
    bp = F.avg_pool2d(xt, 3, stride=1, padding=1, count_include_pad=False)
    bp = _torch_basic_conv(bp, p["branch_pool"])
    ref = _to_nhwc(torch.cat([b1, b7, bd, bp], dim=1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_inception_e_max_pool_variant():
    """Mixed_7c's pytorch-fid quirk: MAX pool in the pool branch."""
    rng = np.random.RandomState(4)
    x = _rand(rng, 1, 8, 8, 20)
    mod = InceptionE(pool="max")
    params = _randomize(mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"],
                        rng)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, params)
    xt = _to_nchw(x)
    b1 = _torch_basic_conv(xt, p["branch1x1"])
    b3 = _torch_basic_conv(xt, p["branch3x3_1"])
    b3 = torch.cat([_torch_basic_conv(b3, p["branch3x3_2a"], padding=(0, 1)),
                    _torch_basic_conv(b3, p["branch3x3_2b"], padding=(1, 0))],
                   dim=1)
    bd = _torch_basic_conv(xt, p["branch3x3dbl_1"])
    bd = _torch_basic_conv(bd, p["branch3x3dbl_2"], padding=1)
    bd = torch.cat([_torch_basic_conv(bd, p["branch3x3dbl_3a"], padding=(0, 1)),
                    _torch_basic_conv(bd, p["branch3x3dbl_3b"], padding=(1, 0))],
                   dim=1)
    bp = F.max_pool2d(xt, 3, stride=1, padding=1)
    bp = _torch_basic_conv(bp, p["branch_pool"])
    ref = _to_nhwc(torch.cat([b1, b3, bd, bp], dim=1))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def _flax_to_torch_sd(params):
    """Invert the importer: flax InceptionV3 params -> torchvision-named
    state_dict (the golden-test harness; mirrors test_legacy_import)."""
    sd = {}
    for name, val in params.items():
        if name == "fc_w":
            sd["fc.weight"] = torch.from_numpy(
                np.ascontiguousarray(np.transpose(np.asarray(val))))
            continue
        if name == "fc_b":
            sd["fc.bias"] = torch.from_numpy(np.asarray(val))
            continue
        blocks = {name: val} if "conv" in val else \
            {f"{name}.{br}": bp for br, bp in val.items()}
        for prefix, p in blocks.items():
            sd[f"{prefix}.conv.weight"] = torch.from_numpy(
                np.ascontiguousarray(
                    np.transpose(np.asarray(p["conv"]), (3, 2, 0, 1))))
            sd[f"{prefix}.bn.weight"] = torch.from_numpy(np.asarray(p["bn_scale"]))
            sd[f"{prefix}.bn.bias"] = torch.from_numpy(np.asarray(p["bn_bias"]))
            sd[f"{prefix}.bn.running_mean"] = torch.from_numpy(
                np.asarray(p["bn_mean"]))
            sd[f"{prefix}.bn.running_var"] = torch.from_numpy(
                np.asarray(p["bn_var"]))
    return sd


@pytest.fixture(scope="module")
def inception_setup():
    net = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    return net, params


@pytest.mark.heavy
def test_importer_golden_roundtrip(inception_setup):
    """flax params -> torch state_dict -> import == identity (values)."""
    net, params = inception_setup
    sd = {k: v.numpy() for k, v in _flax_to_torch_sd(params).items()}
    back = import_inception_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, back))[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


@pytest.mark.heavy
def test_full_forward_shapes_and_extractor(inception_setup, tmp_path):
    net, params = inception_setup
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                    .astype(np.float32))
    feats, logits = net.apply({"params": params}, x)
    assert feats.shape == (2, 2048)
    assert logits.shape == (2, 1008)
    assert bool(jnp.isfinite(feats).all())

    # end-to-end loader path: torch .pth on disk -> extractor
    sd = _flax_to_torch_sd(params)
    path = str(tmp_path / "pt_inception_synth.pth")
    torch.save(sd, path)
    ext = inception_extractor(path=path)
    out = ext(np.asarray(x))
    np.testing.assert_allclose(out, np.asarray(feats), rtol=1e-4, atol=1e-4)

    # FID of a set against itself is ~0 under this extractor
    from sherf_tpu.eval.gan_metrics import compute_fid
    imgs = np.random.RandomState(1).rand(8, 32, 32, 3).astype(np.float32)
    fid = compute_fid(imgs, imgs, ext)
    assert abs(fid) < 1e-4
