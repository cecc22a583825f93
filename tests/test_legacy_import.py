"""Full-generator checkpoint import: structural (shape-exact) validation of
import_sherf_generator against SHERFGenerator.init, using a synthetic
reference state_dict with the TriPlaneGenerator key naming."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sherf_tpu.compat.legacy_import import import_sherf_generator
from sherf_tpu.core.config import ModelConfig, RenderConfig


def _resnet18_sd(sd, prefix):
    r = np.random.RandomState(0)
    def add(k, *shape):
        sd[prefix + k] = r.randn(*shape).astype(np.float32) * 0.05
    def bn(k, c):
        add(k + ".weight", c); add(k + ".bias", c)
        add(k + ".running_mean", c)
        sd[prefix + k + ".running_var"] = np.ones(c, np.float32)
    add("conv1.weight", 64, 3, 7, 7); bn("bn1", 64)
    chans = [64, 128, 256, 512]
    for i in range(1, 5):
        cin = chans[max(i - 2, 0)]
        cout = chans[i - 1]
        for b in range(2):
            c_in = cin if b == 0 else cout
            add(f"layer{i}.{b}.conv1.weight", cout, c_in, 3, 3)
            add(f"layer{i}.{b}.conv2.weight", cout, cout, 3, 3)
            bn(f"layer{i}.{b}.bn1", cout); bn(f"layer{i}.{b}.bn2", cout)
            if b == 0 and i > 1:
                add(f"layer{i}.{b}.downsample.0.weight", cout, c_in, 1, 1)
                bn(f"layer{i}.{b}.downsample.1", cout)


def _stylegan_sd(sd, prefix, img_resolution=64):
    import math
    r = np.random.RandomState(1)
    def add(k, *shape):
        sd[prefix + k] = np.asarray(r.randn(*shape), np.float32) * 0.05
    for i in range(2):
        add(f"mapping.fc{i}.weight", 512, 512); add(f"mapping.fc{i}.bias", 512)
    add("mapping.w_avg", 512)
    chans = {res: min(32768 // res, 512)
             for res in [2 ** i for i in range(2, int(math.log2(img_resolution)) + 1)]}
    prev = None
    for res in sorted(chans):
        c = chans[res]
        b = f"synthesis.b{res}"
        if res == 4:
            add(b + ".const", c, 4, 4)
        else:
            add(b + ".conv0.weight", c, chans[res // 2], 3, 3)
            add(b + ".conv0.bias", c)
            add(b + ".conv0.affine.weight", chans[res // 2], 512)
            add(b + ".conv0.affine.bias", chans[res // 2])
            add(b + ".conv0.noise_strength")
            add(b + ".conv0.noise_const", res, res)
        add(b + ".conv1.weight", c, c, 3, 3); add(b + ".conv1.bias", c)
        add(b + ".conv1.affine.weight", c, 512); add(b + ".conv1.affine.bias", c)
        add(b + ".conv1.noise_strength"); add(b + ".conv1.noise_const", res, res)
        add(b + ".torgb.weight", 96, c, 1, 1); add(b + ".torgb.bias", 96)
        add(b + ".torgb.affine.weight", c, 512); add(b + ".torgb.affine.bias", c)


def _fake_reference_sd():
    sd = {}
    r = np.random.RandomState(2)
    def add(k, *shape):
        sd[k] = r.randn(*shape).astype(np.float32) * 0.05
    _resnet18_sd(sd, "encoder_2d.backbone.")
    _resnet18_sd(sd, "encoder_2d_feature.backbone.")
    add("conv1d_projection.weight", 32, 96, 1); add("conv1d_projection.bias", 32)
    _stylegan_sd(sd, "backbone.")
    add("renderer.conv1d_projection.weight", 96, 192, 1)
    add("renderer.conv1d_projection.bias", 96)
    add("renderer.conv1d_reprojection.weight", 32, 96, 1)
    add("renderer.conv1d_reprojection.bias", 32)
    # transformer (dim 32, heads 3, dim_head 16)
    t = "renderer.transformer.layers.0"
    add(t + ".0.fn.norm.weight", 32); add(t + ".0.fn.norm.bias", 32)
    add(t + ".0.fn.fn.to_qkv.weight", 144, 32)
    add(t + ".0.fn.fn.to_out.0.weight", 32, 48); add(t + ".0.fn.fn.to_out.0.bias", 32)
    add(t + ".1.fn.norm.weight", 32); add(t + ".1.fn.norm.bias", 32)
    add(t + ".1.fn.fn.net.0.weight", 32, 32); add(t + ".1.fn.fn.net.0.bias", 32)
    add(t + ".1.fn.fn.net.3.weight", 32, 32); add(t + ".1.fn.fn.net.3.bias", 32)
    # NeRF decoder
    dims_in = [71] + [128] * 4 + [199] + [128] * 2
    for i, din in enumerate(dims_in):
        add(f"decoder.pts_linears.{i}.weight", 128, din)
        add(f"decoder.pts_linears.{i}.bias", 128)
    add("decoder.alpha_linear.weight", 1, 128); add("decoder.alpha_linear.bias", 1)
    add("decoder.feature_linear.weight", 128, 128); add("decoder.feature_linear.bias", 128)
    add("decoder.views_linear.weight", 64, 187); add("decoder.views_linear.bias", 64)
    add("decoder.rgb_linear.weight", 3, 64); add("decoder.rgb_linear.bias", 3)
    # sparse conv net (spconv native layout (out, kd, kh, kw, in))
    def sp(name, cin, cout, n):
        for i in range(n):
            c_in = cin if i == 0 else cout
            add(f"renderer.encoder_3d.{name}.{3 * i}.weight", cout, 3, 3, 3, c_in)
            add(f"renderer.encoder_3d.{name}.{3 * i + 1}.weight", cout)
            add(f"renderer.encoder_3d.{name}.{3 * i + 1}.bias", cout)
            add(f"renderer.encoder_3d.{name}.{3 * i + 1}.running_mean", cout)
            sd[f"renderer.encoder_3d.{name}.{3 * i + 1}.running_var"] = \
                np.ones(cout, np.float32)
    sp("conv0", 32, 32, 2); sp("down0", 32, 32, 1)
    sp("conv1", 32, 32, 2); sp("down1", 32, 64, 1)
    sp("conv2", 64, 64, 3); sp("down2", 64, 96, 1)
    sp("conv3", 96, 96, 3)
    return sd


@pytest.mark.heavy
def test_full_generator_import_structure():
    import chex

    from sherf_tpu.data import make_synthetic_batch
    from sherf_tpu.models import SHERFGenerator
    from sherf_tpu.smpl import synthetic_smpl

    sd = _fake_reference_sd()
    params, stats, noise, ema = import_sherf_generator(
        sd, backbone_resolution=64)

    smpl = synthetic_smpl(0)
    cfg = ModelConfig(backbone_resolution=64, voxel_size=0.02,
                      render=RenderConfig(depth_resolution=4))
    from sherf_tpu.features.sparseconv import prepare_voxel_volume
    from sherf_tpu.smpl import smpl_forward, big_pose_params
    bp = big_pose_params()
    t_verts = np.asarray(smpl_forward(smpl, jnp.asarray(bp["poses"]),
                                      jnp.asarray(bp["shapes"]))[0])
    _, out_sh = prepare_voxel_volume(t_verts, voxel_size=0.02)
    model = SHERFGenerator(cfg, out_sh=out_sh)
    batch = make_synthetic_batch(smpl, batch_size=1, H=8, W=8, seed=0)
    init_vars = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, smpl))(batch)

    chex.assert_trees_all_equal_shapes(init_vars["params"], params)
    chex.assert_trees_all_equal_shapes(init_vars["batch_stats"], stats)
    chex.assert_trees_all_equal_shapes(init_vars["noise"], noise)

    # imported params actually run
    out = jax.jit(lambda v, b: model.apply(v, b, smpl))(
        {"params": params, "batch_stats": stats, "noise": noise, "ema": ema},
        batch)
    assert bool(jnp.isfinite(out["image_raw"]).all())
