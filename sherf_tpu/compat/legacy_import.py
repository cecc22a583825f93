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
    as plain numpy mappings.  Requires torch (CPU) for tensor unpickling."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f)
    out = {}
    for key, module in data.items():
        if hasattr(module, "state_dict"):
            out[key] = {k: _np(v) for k, v in module.state_dict().items()}
    return out


# ---------------------------------------------------------------------------
# ResNet18 (torchvision layout -> features.resnet.ResNet18)


def import_resnet18(sd: Mapping[str, np.ndarray], prefix: str = ""):
    """Returns (params, batch_stats) for features.resnet.ResNet18."""
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

    for i in range(1, 5):
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
