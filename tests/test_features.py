"""Encoders / encodings / transformer structural + behavioral tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sherf_tpu.features import positional_encoding, PlaneTransformer, ResNet18


def test_positional_encoding_layout():
    x = jnp.asarray(np.random.RandomState(0).randn(7, 3).astype(np.float32))
    out = positional_encoding(x, num_freqs=6)
    assert out.shape == (7, 3 + 2 * 6 * 3)  # 39, the NeRF decoder input size
    np.testing.assert_allclose(out[:, :3], x, atol=0)
    np.testing.assert_allclose(out[:, 3:6], np.sin(np.asarray(x)), atol=1e-6)
    np.testing.assert_allclose(out[:, 6:9], np.cos(np.asarray(x)), atol=1e-6)
    # frequency doubling: second block is sin(2x)
    np.testing.assert_allclose(out[:, 9:12], np.sin(2 * np.asarray(x)), atol=1e-6)
    # rgb encoding: 5 freqs -> 33 channels, truncated to 32 by callers
    assert positional_encoding(x, num_freqs=5).shape[-1] == 33
    # view encoding: 4 freqs -> 27
    assert positional_encoding(x, num_freqs=4).shape[-1] == 27


def test_plane_transformer_shapes_and_token_mixing():
    model = PlaneTransformer(dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (100, 3, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    # tokens attend to each other: perturbing token 0 changes token 2 output
    x2 = x.at[:, 0].add(1.0)
    y2 = model.apply(params, x2)
    assert float(jnp.abs(y2[:, 2] - y[:, 2]).max()) > 1e-6
    # attention is permutation-equivariant over tokens (no positional enc)
    perm = jnp.array([2, 0, 1])
    y_perm = model.apply(params, x[:, perm])
    np.testing.assert_allclose(np.asarray(y_perm), np.asarray(y[:, perm]), atol=1e-5)


def test_resnet18_shapes_and_param_count():
    model = ResNet18()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (1, 512)
    feat = model.apply(variables, x, extract_feature=True)
    assert feat.shape == (1, 32, 32, 64)  # maxpool skipped, stop after layer1

    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    # torchvision resnet18 conv+bn-affine parameter count (no fc head)
    assert int(n_params) == 11176512


def test_positional_encoding_recurrence_matches_exact():
    """The double-angle fast path tracks the direct sin/cos formulation to
    <1e-5 across the production frequency counts."""
    import numpy as np

    x = jnp.asarray(np.random.RandomState(7).uniform(-4, 4, (512, 3))
                    .astype(np.float32))
    for n in (4, 5, 6):
        a = np.asarray(positional_encoding(x, n, exact=True))
        b = np.asarray(positional_encoding(x, n))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_superresolution_oracle():
    """SR head vs the reference SuperresolutionHybrid2X on CPU with
    imported weights (superresolution.py:94-124).  Module-level oracle:
    the reference cannot run SR end-to-end in any SHERF config (3-channel
    latent into a channels=32 module, triplane.py:60,156 — a shape error),
    so EG3D's intended 32-channel latent is used here."""
    import numpy as np
    import torch
    import jax

    from sherf_tpu.compat import reference_runtime as rr
    from sherf_tpu.compat.legacy_import import import_superresolution
    from sherf_tpu.features.superresolution import SuperresolutionHybrid

    rr.install_reference_modules()
    rr.patch_torch_cpu()
    from training import superresolution as ref_sr

    torch.manual_seed(0)
    ref = ref_sr.SuperresolutionHybrid2X(
        channels=32, img_resolution=128, sr_num_fp16_res=0,
        sr_antialias=True)
    ref.eval().float()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, noise = import_superresolution(sd)
    model = SuperresolutionHybrid(img_resolution=128, channels=32,
                                  deep_channels=False)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 64, 64, 32).astype(np.float32)
    rgb = rng.randn(1, 64, 64, 3).astype(np.float32)
    ws = rng.randn(1, 5, 512).astype(np.float32)

    with torch.no_grad():
        # .copy(): the reference's skip connection is an in-place img.add_
        # (superresolution.py:253) which would mutate the shared
        # from_numpy buffer before our side reads it
        out_ref = ref(torch.from_numpy(rgb.copy()).permute(0, 3, 1, 2),
                      torch.from_numpy(x.copy()).permute(0, 3, 1, 2),
                      torch.from_numpy(ws), noise_mode="none",
                      force_fp32=True)
    out = jax.jit(lambda v, r, xx, w: model.apply(
        v, r, xx, w, noise_mode="none"))(
        {"params": params, "noise": noise}, rgb, x, ws)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)),
        out_ref.numpy(), atol=2e-3)
