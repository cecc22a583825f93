"""upfirdn2d / bias_act / conv2d_resample parity vs the reference's pure
PyTorch CPU paths (torch_utils/ops/*, impl='ref')."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from sherf_tpu.kernels import (
    setup_filter, upfirdn2d, upsample2d, downsample2d, filter2d,
    bias_act, conv2d_resample,
)
from conftest import add_reference_path

add_reference_path()
from torch_utils.ops import upfirdn2d as ref_upfirdn2d  # noqa: E402
from torch_utils.ops import bias_act as ref_bias_act    # noqa: E402
from torch_utils.ops import conv2d_resample as ref_conv2d_resample  # noqa: E402


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def _nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


FILTER = [1, 3, 3, 1]


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, 0), (2, 1, 1), (1, 2, 1), (2, 2, [1, 0, 2, 1]), (1, 1, [2, -1, 0, 1]),
])
def test_upfirdn2d_matches_reference(up, down, padding):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 16, 3).astype(np.float32)
    f_ref = ref_upfirdn2d.setup_filter(FILTER)
    f = setup_filter(FILTER)
    ref = ref_upfirdn2d.upfirdn2d(_nchw(x), f_ref, up=up, down=down,
                                  padding=padding, gain=1.5, impl="ref")
    ours = upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=padding, gain=1.5)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), atol=1e-5)


def test_upsample_downsample_filter2d():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    f_ref = ref_upfirdn2d.setup_filter(FILTER)
    f = setup_filter(FILTER)

    ref = ref_upfirdn2d.upsample2d(_nchw(x), f_ref, impl="ref")
    np.testing.assert_allclose(np.asarray(upsample2d(jnp.asarray(x), f)), _nhwc(ref), atol=1e-5)

    ref = ref_upfirdn2d.downsample2d(_nchw(x), f_ref, impl="ref")
    np.testing.assert_allclose(np.asarray(downsample2d(jnp.asarray(x), f)), _nhwc(ref), atol=1e-5)

    ref = ref_upfirdn2d.filter2d(_nchw(x), f_ref, impl="ref")
    np.testing.assert_allclose(np.asarray(filter2d(jnp.asarray(x), f)), _nhwc(ref), atol=1e-5)


@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "sigmoid", "softplus", "tanh"])
def test_bias_act_matches_reference(act):
    rng = np.random.RandomState(2)
    x = rng.randn(4, 6, 6, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    ref = ref_bias_act.bias_act(_nchw(x), torch.from_numpy(b), act=act, gain=1.3,
                                clamp=0.9, impl="ref")
    ours = bias_act(jnp.asarray(x), jnp.asarray(b), act=act, gain=1.3, clamp=0.9)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), atol=1e-5)


def test_bias_act_default_gain():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 8).astype(np.float32)
    ref = ref_bias_act.bias_act(torch.from_numpy(x), act="lrelu", impl="ref")
    ours = bias_act(jnp.asarray(x), act="lrelu")
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("up,down,kernel,padding,flip_weight", [
    (1, 1, 3, 1, True),
    (2, 1, 3, 0, False),   # SynthesisLayer up path (flip_weight = up==1)
    (1, 2, 3, 1, True),    # Discriminator down path
    (2, 1, 1, 0, True),    # 1x1 up (skip connections)
    (1, 2, 1, 0, True),    # 1x1 down
])
def test_conv2d_resample_matches_reference(up, down, kernel, padding, flip_weight):
    rng = np.random.RandomState(4)
    cin, cout = 6, 5
    x = rng.randn(2, 8, 8, cin).astype(np.float32)
    w_oihw = rng.randn(cout, cin, kernel, kernel).astype(np.float32)
    f_ref = ref_upfirdn2d.setup_filter(FILTER)
    f = setup_filter(FILTER)

    ref = ref_conv2d_resample.conv2d_resample(
        x=_nchw(x), w=torch.from_numpy(w_oihw), f=f_ref, up=up, down=down,
        padding=padding, flip_weight=flip_weight)
    w_hwio = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))
    ours = conv2d_resample(jnp.asarray(x), w_hwio, f, up=up, down=down,
                           padding=padding, flip_weight=flip_weight)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), atol=2e-4)
