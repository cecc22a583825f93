"""Reference-checkpoint import: torch state_dicts -> flax param pytrees.

The reference persists whole pickled modules (persistence.py + legacy.py
load_network_pkl).  We consume either a raw ``state_dict()``-style mapping
of numpy arrays or the reference snapshot pickle, and emit the param /
batch_stats / noise collections of our flax modules.

Conventions translated:
  * torch Linear weight (out, in)        -> EqualDense keeps (out, in)
  * torch Conv2d weight (out, in, kh, kw)-> HWIO (kh, kw, in, out)
  * torch BatchNorm (weight, bias, running_mean, running_var)
                                         -> (scale, bias) + batch_stats
  * spconv SubMConv3d weight             -> (3, 3, 3, in, out)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv_w(x) -> jnp.ndarray:
    """(out, in, kh, kw) -> (kh, kw, in, out)."""
    return jnp.asarray(np.transpose(_np(x), (2, 3, 1, 0)))


def load_reference_pickle(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load a reference snapshot .pkl and return {'G_ema': state_dict, ...}
    as plain numpy mappings.  Requires torch (CPU) for tensor unpickling.

    Released ``SHERF_*.pkl`` snapshots are PERSISTENCE pickles
    (reference torch_utils/persistence.py:37-134, consumed via
    legacy.py:24-39): unpickling resolves
    ``torch_utils.persistence._reconstruct_persistent_obj`` by module path
    and exec's the embedded module sources, whose top-level imports
    (``training.*``, ``dnnlib``, spconv, pytorch3d, torchvision) must be
    importable, and the reference's hard-coded ``.cuda()`` pins must be
    neutralized on a CPU host.  Install that environment BEFORE touching
    the stream; a bare ``pickle.load`` dies on the first persistent object.
    """
    import pickle

    try:
        # reference tree + pure-torch stand-ins for the CUDA-only deps
        from sherf_tpu.compat import reference_runtime as rr

        rr.install_reference_modules()
        rr.patch_torch_cpu()
    except Exception:
        # reference tree / torch unavailable: plain state_dict pickles
        # (our own exports) still load below; a persistence pickle will
        # fail with the unpatched ModuleNotFoundError, which is the
        # honest signal that the reference sources are required
        pass
    with open(path, "rb") as f:
        data = pickle.load(f)
    out = {}
    for key, module in data.items():
        if hasattr(module, "state_dict"):
            out[key] = {k: _np(v) for k, v in module.state_dict().items()}
    return out


# ---------------------------------------------------------------------------
# ResNet18 (torchvision layout -> features.resnet.ResNet18)


def import_resnet18(sd: Mapping[str, np.ndarray], prefix: str = "",
                    max_stage: int = 4):
    """Returns (params, batch_stats) for features.resnet.ResNet18.

    ``max_stage`` limits the imported stages — the feature-extraction
    encoder only executes conv1/bn1/layer1 (triplane.py:325-335), so its
    flax params stop there."""
    p = lambda k: sd[prefix + k]
    params: Dict = {}
    stats: Dict = {}

    def bn(dst_p, dst_s, key):
        dst_p["scale"] = jnp.asarray(_np(p(key + ".weight")))
        dst_p["bias"] = jnp.asarray(_np(p(key + ".bias")))
        dst_s["mean"] = jnp.asarray(_np(p(key + ".running_mean")))
        dst_s["var"] = jnp.asarray(_np(p(key + ".running_var")))

    params["conv1"] = {"kernel": _conv_w(p("conv1.weight"))}
    params["bn1"], stats["bn1"] = {}, {}
    bn(params["bn1"], stats["bn1"], "bn1")

    for i in range(1, max_stage + 1):
        for b in range(2):
            name = f"layer{i}_{b}"
            src = f"layer{i}.{b}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            blk_p["conv1"] = {"kernel": _conv_w(p(src + ".conv1.weight"))}
            blk_p["conv2"] = {"kernel": _conv_w(p(src + ".conv2.weight"))}
            blk_p["bn1"], blk_s["bn1"] = {}, {}
            bn(blk_p["bn1"], blk_s["bn1"], src + ".bn1")
            blk_p["bn2"], blk_s["bn2"] = {}, {}
            bn(blk_p["bn2"], blk_s["bn2"], src + ".bn2")
            if (prefix + src + ".downsample.0.weight") in sd:
                blk_p["down_conv"] = {"kernel": _conv_w(p(src + ".downsample.0.weight"))}
                blk_p["down_bn"], blk_s["down_bn"] = {}, {}
                bn(blk_p["down_bn"], blk_s["down_bn"], src + ".downsample.1")
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


# ---------------------------------------------------------------------------
# StyleGAN2 backbone


def import_mapping(sd: Mapping[str, np.ndarray], prefix: str = "mapping.",
                   num_layers: int = 2):
    """Returns (params, ema) for features.stylegan2.MappingNetwork."""
    params = {}
    for i in range(num_layers):
        params[f"fc{i}"] = {
            "weight": jnp.asarray(_np(sd[f"{prefix}fc{i}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}fc{i}.bias"])),
        }
    ema = {"w_avg": jnp.asarray(_np(sd[f"{prefix}w_avg"]))}
    return params, ema


def _import_synth_layer(sd, prefix):
    params = {
        "weight": _conv_w(sd[prefix + ".weight"]),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"])),
        "affine": {
            "weight": jnp.asarray(_np(sd[prefix + ".affine.weight"])),
            "bias": jnp.asarray(_np(sd[prefix + ".affine.bias"])),
        },
    }
    noise = {}
    if prefix + ".noise_strength" in sd:
        params["noise_strength"] = jnp.asarray(_np(sd[prefix + ".noise_strength"]))
        noise["noise_const"] = jnp.asarray(_np(sd[prefix + ".noise_const"]))
    return params, noise


def import_stylegan2_backbone(sd: Mapping[str, np.ndarray], img_resolution: int = 256,
                              prefix: str = "", mapping_layers: int = 2):
    """Returns (params, noise, ema) collections for
    features.stylegan2.StyleGAN2Backbone from a reference backbone
    state_dict (networks_stylegan2.Generator layout)."""
    import math

    synth_p: Dict = {}
    noise_c: Dict = {}
    resolutions = [2 ** i for i in range(2, int(math.log2(img_resolution)) + 1)]
    for res in resolutions:
        bp: Dict = {}
        bn: Dict = {}
        src = f"{prefix}synthesis.b{res}"
        if res == 4:
            bp["const"] = jnp.asarray(np.transpose(_np(sd[src + ".const"]), (1, 2, 0)))
        else:
            bp["conv0"], n0 = _import_synth_layer(sd, src + ".conv0")
            if n0:
                bn["conv0"] = n0
        bp["conv1"], n1 = _import_synth_layer(sd, src + ".conv1")
        if n1:
            bn["conv1"] = n1
        bp["torgb"], _ = _import_synth_layer(sd, src + ".torgb")
        synth_p[f"b{res}"] = bp
        if bn:
            noise_c[f"b{res}"] = bn

    map_p, map_ema = import_mapping(sd, prefix=prefix + "mapping.",
                                    num_layers=mapping_layers)
    params = {"synthesis": synth_p, "mapping": map_p}
    noise = {"synthesis": noise_c}
    ema = {"mapping": map_ema}
    return params, noise, ema


def import_superresolution(sd: Mapping[str, np.ndarray], prefix: str = ""):
    """Reference SuperresolutionHybrid{2X,4X,8X,8XDC} state_dict ->
    (params, noise) for features.superresolution.SuperresolutionHybrid
    (two blocks of conv0/conv1/torgb SynthesisLayers,
    superresolution.py:29-291)."""
    params: Dict = {}
    noise: Dict = {}
    for b in ("block0", "block1"):
        bp: Dict = {}
        bn: Dict = {}
        for layer in ("conv0", "conv1"):
            bp[layer], n = _import_synth_layer(sd, f"{prefix}{b}.{layer}")
            if n:
                bn[layer] = n
        bp["torgb"], _ = _import_synth_layer(sd, f"{prefix}{b}.torgb")
        params[b] = bp
        if bn:
            noise[b] = bn
    return params, noise


# ---------------------------------------------------------------------------
# Full SHERF generator (reference TriPlaneGenerator state_dict)


def _linear(sd, key):
    """torch Linear/Conv1d(k=1) (out, in[, 1]) -> flax Dense {kernel, bias}."""
    w = _np(sd[key + ".weight"])
    if w.ndim == 3:
        w = w[..., 0]
    out = {"kernel": jnp.asarray(w.T)}
    if key + ".bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[key + ".bias"]))
    return out


def _layernorm(sd, key):
    return {"scale": jnp.asarray(_np(sd[key + ".weight"])),
            "bias": jnp.asarray(_np(sd[key + ".bias"]))}


def _spconv_w(sd, key, layout: str = "native"):
    """spconv SubMConv3d/SparseConv3d weight -> (kd, kh, kw, in, out).

    spconv 2.x 'native' layout is (out, kd, kh, kw, in)."""
    w = _np(sd[key + ".weight"])
    if layout == "native":
        return jnp.asarray(np.transpose(w, (1, 2, 3, 4, 0)))
    return jnp.asarray(w)  # already (kd, kh, kw, in, out)


def _bn1d(sd, key):
    p = {"scale": jnp.asarray(_np(sd[key + ".weight"])),
         "bias": jnp.asarray(_np(sd[key + ".bias"]))}
    s = {"mean": jnp.asarray(_np(sd[key + ".running_mean"])),
         "var": jnp.asarray(_np(sd[key + ".running_var"]))}
    return p, s


def _sparse_stage(sd, key, n_convs, layout):
    """double_conv / triple_conv SparseSequential: conv at 3k, BN at 3k+1."""
    p, s = {}, {}
    for i in range(n_convs):
        p[f"conv{i}"] = _spconv_w(sd, f"{key}.{3 * i}", layout)
        bp, bs = _bn1d(sd, f"{key}.{3 * i + 1}")
        p[f"bn{i}"] = bp
        s[f"bn{i}"] = bs
    return p, s


def _sparse_down(sd, key, layout):
    p, s = {}, {}
    p["conv"] = _spconv_w(sd, f"{key}.0", layout)
    bp, bs = _bn1d(sd, f"{key}.1")
    p["bn"] = bp
    s["bn"] = bs
    return p, s


def import_sherf_generator(sd: Mapping[str, np.ndarray],
                           use_nerf_decoder: bool = True,
                           use_trans: bool = True,
                           use_1d_feature: bool = True,
                           use_2d_feature: bool = True,
                           use_3d_feature: bool = True,
                           sparse_layers: int = 4,
                           backbone_resolution: int = 256,
                           spconv_layout: str = "native"):
    """Reference TriPlaneGenerator state_dict -> (params, batch_stats,
    noise, ema) for models.SHERFGenerator.

    NOTE: validated structurally (shape-exact vs SHERFGenerator.init); the
    released SHERF pickles are not downloadable in this environment, so key
    naming follows the reference source (triplane.py / renderer.py).
    """
    params: Dict = {}
    stats: Dict = {}

    params["encoder_2d"], stats["encoder_2d"] = import_resnet18(
        sd, prefix="encoder_2d.backbone.")
    params["encoder_2d_feature"], stats["encoder_2d_feature"] = import_resnet18(
        sd, prefix="encoder_2d_feature.backbone.", max_stage=1)
    params["conv1d_projection"] = _linear(sd, "conv1d_projection")

    bb_p, bb_noise, bb_ema = import_stylegan2_backbone(
        sd, img_resolution=backbone_resolution, prefix="backbone.",
        mapping_layers=2)
    params["backbone"] = bb_p

    r: Dict = {}
    rs: Dict = {}
    r["conv1d_projection"] = _linear(sd, "renderer.conv1d_projection")
    # conv1d_reprojection only exists with >=2 feature banks (96->32 for
    # three, 64->32 for two; reference renderer.py:272-275)
    n_banks = int(use_1d_feature) + int(use_2d_feature) + int(use_3d_feature)
    if n_banks >= 2:
        r["conv1d_reprojection"] = _linear(sd, "renderer.conv1d_reprojection")

    if use_trans:
        tr = {
            "attn_norm_0": _layernorm(sd, "renderer.transformer.layers.0.0.fn.norm"),
            "ff_norm_0": _layernorm(sd, "renderer.transformer.layers.0.1.fn.norm"),
            "attn_0": {
                "to_qkv": {"kernel": jnp.asarray(
                    _np(sd["renderer.transformer.layers.0.0.fn.fn.to_qkv.weight"]).T)},
                "to_out": _linear(sd, "renderer.transformer.layers.0.0.fn.fn.to_out.0"),
            },
            "ff_0": {
                "fc1": _linear(sd, "renderer.transformer.layers.0.1.fn.fn.net.0"),
                "fc2": _linear(sd, "renderer.transformer.layers.0.1.fn.fn.net.3"),
            },
        }
        r["transformer"] = tr

    if use_nerf_decoder:
        dec = {f"pts_{i}": _linear(sd, f"decoder.pts_linears.{i}")
               for i in range(8)}
        dec["alpha"] = _linear(sd, "decoder.alpha_linear")
        dec["feature"] = _linear(sd, "decoder.feature_linear")
        dec["views"] = _linear(sd, "decoder.views_linear")
        dec["rgb"] = _linear(sd, "decoder.rgb_linear")
    else:
        dec = {
            "fc0": {"weight": jnp.asarray(_np(sd["decoder.net.0.weight"])),
                    "bias": jnp.asarray(_np(sd["decoder.net.0.bias"]))},
            "fc1": {"weight": jnp.asarray(_np(sd["decoder.net.2.weight"])),
                    "bias": jnp.asarray(_np(sd["decoder.net.2.bias"]))},
        }
    r["decoder"] = dec

    # the reference constructs encoder_3d unconditionally (renderer.py:270)
    # but only the use_3d_feature path consumes it; import it only when our
    # generator will instantiate the module
    if use_3d_feature:
        e3: Dict = {}
        e3s: Dict = {}
        e3["conv0"], e3s["conv0"] = _sparse_stage(sd, "renderer.encoder_3d.conv0", 2, spconv_layout)
        e3["down0"], e3s["down0"] = _sparse_down(sd, "renderer.encoder_3d.down0", spconv_layout)
        if sparse_layers > 1:
            e3["conv1"], e3s["conv1"] = _sparse_stage(sd, "renderer.encoder_3d.conv1", 2, spconv_layout)
            e3["down1"], e3s["down1"] = _sparse_down(sd, "renderer.encoder_3d.down1", spconv_layout)
        if sparse_layers > 2:
            e3["conv2"], e3s["conv2"] = _sparse_stage(sd, "renderer.encoder_3d.conv2", 3, spconv_layout)
            e3["down2"], e3s["down2"] = _sparse_down(sd, "renderer.encoder_3d.down2", spconv_layout)
        if sparse_layers > 3:
            e3["conv3"], e3s["conv3"] = _sparse_stage(sd, "renderer.encoder_3d.conv3", 3, spconv_layout)
        r["encoder_3d"] = e3
        rs["encoder_3d"] = e3s

    params["renderer"] = r
    stats["renderer"] = rs

    noise = {"backbone": bb_noise}
    ema = {"backbone": bb_ema}
    return params, stats, noise, ema
