"""Parity tests for the alias-free (StyleGAN3) path.

Oracles: the reference's pure-torch CPU implementations —
torch_utils/ops/filtered_lrelu.py:_filtered_lrelu_ref and
training/networks_stylegan3.py (SynthesisLayer forward on CPU falls back to
the ref op path automatically).
"""

import numpy as np
import pytest

from conftest import add_reference_path


def test_filtered_lrelu_matches_reference():
    import torch

    add_reference_path()
    from torch_utils.ops.filtered_lrelu import _filtered_lrelu_ref

    from sherf_tpu.kernels.filters import filtered_lrelu

    rng = np.random.RandomState(0)
    for up, down, taps_u, taps_d, pad in [
        (1, 1, 1, 1, 0),
        (2, 1, 12, 1, (3, 2, 4, 1)),
        (2, 2, 12, 12, (8, 7, 8, 7)),
        (1, 2, 1, 12, 11),
    ]:
        x = rng.randn(2, 5, 9, 8).astype(np.float32)  # NCHW for torch
        b = rng.randn(5).astype(np.float32)
        fu = rng.rand(taps_u).astype(np.float32) if taps_u > 1 else None
        fd = rng.rand(taps_d).astype(np.float32) if taps_d > 1 else None
        if fu is not None:
            fu /= fu.sum()
        if fd is not None:
            fd /= fd.sum()

        ref = _filtered_lrelu_ref(
            torch.from_numpy(x),
            fu=torch.from_numpy(fu) if fu is not None else None,
            fd=torch.from_numpy(fd) if fd is not None else None,
            b=torch.from_numpy(b), up=up, down=down, padding=pad,
            gain=np.sqrt(2), slope=0.2, clamp=4.0).numpy()

        got = np.asarray(filtered_lrelu(
            np.transpose(x, (0, 2, 3, 1)),
            fu=np.outer(fu, fu) if fu is not None else None,
            fd=np.outer(fd, fd) if fd is not None else None,
            b=b, up=up, down=down, padding=pad,
            gain=np.sqrt(2), slope=0.2, clamp=4.0))
        got = np.transpose(got, (0, 3, 1, 2))
        assert got.shape == ref.shape, (up, down, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def _torch_sg3_layer(**kw):
    add_reference_path()
    from training.networks_stylegan3 import SynthesisLayer as TorchLayer

    return TorchLayer(**kw)


@pytest.mark.parametrize("is_torgb", [False, True])
def test_sg3_synthesis_layer_parity(is_torgb):
    import torch
    import jax
    import jax.numpy as jnp

    from sherf_tpu.features.stylegan3 import SynthesisLayer

    spec = dict(
        w_dim=32, is_torgb=is_torgb, is_critically_sampled=is_torgb,
        in_channels=8, out_channels=4 if is_torgb else 6,
        in_size=16, out_size=16,
        in_sampling_rate=16, out_sampling_rate=16,
        in_cutoff=2.0, out_cutoff=2.0 if is_torgb else 2.8,
        in_half_width=6.0, out_half_width=6.0 if is_torgb else 5.2,
    )
    tl = _torch_sg3_layer(use_fp16=False, **spec)
    tl.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(2, spec["in_channels"], 16, 16).astype(np.float32)
    w = rng.randn(2, spec["w_dim"]).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.from_numpy(x), torch.from_numpy(w),
                 noise_mode="none").numpy()

    jl = SynthesisLayer(**spec)
    variables = jl.init(jax.random.PRNGKey(0), jnp.asarray(
        np.transpose(x, (0, 2, 3, 1))), jnp.asarray(w))

    # import torch weights: OIkk -> HWIO (flip not needed: both correlate)
    tw = tl.weight.detach().numpy()                      # (O, I, kh, kw)
    params = variables["params"]
    params["weight"] = jnp.asarray(np.transpose(tw, (2, 3, 1, 0)))
    params["bias"] = jnp.asarray(tl.bias.detach().numpy())
    params["affine"]["weight"] = jnp.asarray(tl.affine.weight.detach().numpy())
    params["affine"]["bias"] = jnp.asarray(tl.affine.bias.detach().numpy())

    got = np.asarray(jl.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(w)))
    got = np.transpose(got, (0, 3, 1, 2))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_sg3_generator_runs():
    import jax
    import jax.numpy as jnp

    from sherf_tpu.features.stylegan3 import SG3Generator

    g = SG3Generator(z_dim=16, w_dim=32, img_resolution=32, img_channels=3,
                     num_layers=4, channel_base=1024, channel_max=32)
    z = jnp.asarray(np.random.RandomState(0).randn(2, 16), jnp.float32)
    variables = g.init(jax.random.PRNGKey(0), z)
    img = g.apply(variables, z)
    assert img.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(img).all())
