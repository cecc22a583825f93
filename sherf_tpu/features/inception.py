"""InceptionV3 feature extractor for the GAN metric suite.

The reference metrics (fid50k_full / kid50k_full / is50k,
metrics/metric_main.py:87-152) are DEFINED by the TF
``inception-2015-12-05`` network's "pool_3" features, served as an NVIDIA
torchscript pickle (frechet_inception_distance.py:23-24 — a direct
translation of the TF graph).  This module is a native flax implementation
of that graph: the torchvision ``inception_v3`` layout with the pytorch-fid
patches that restore the TF semantics (average-pool branches computed with
``count_include_pad=False``, and Mixed_7c's pool branch using MAX pooling),
plus a weight importer for torch state_dicts in torchvision naming — e.g.
pytorch-fid's ``pt_inception-2015-12-05-*.pth``, whose outputs match the
reference detector.

No weights ship in this repo (zero egress); place a torch state_dict at
``$SHERF_INCEPTION_WEIGHTS`` (or pass a path) and
:func:`inception_extractor` plugs it into ``eval/gan_metrics.py`` so FID /
KID / IS reproduce the reference definition.

All convs are NHWC / HWIO; BN runs in inference mode with imported running
statistics (eps 1e-3, torchvision BasicConv2d).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
FEATURE_DIM = 2048
# the 2015 TF graph classifies 1008 classes (pytorch-fid fc shape)
NUM_CLASSES = 1008


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps 1e-3, affine, running stats) + relu."""

    out_channels: int
    kernel: Sequence[int] = (1, 1)
    stride: int = 1
    padding: Sequence = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param("conv", nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"), (kh, kw, cin, self.out_channels))
        x = jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), list(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c = self.out_channels
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
        return jax.nn.relu(x)


def _avg_pool_3x3_tf(x):
    """3x3 stride-1 average pool, pad 1, count_include_pad=False — the
    pytorch-fid patch restoring TF edge semantics."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / n


def _max_pool(x, k: int, stride: int, pad: int = 0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, name="branch1x1")(x)
        b5 = BasicConv2d(48, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, name="branch_pool")(
            _avg_pool_3x3_tf(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))  # (1,7) kernel
        p71 = ((3, 3), (0, 0))  # (7,1) kernel
        b1 = BasicConv2d(192, name="branch1x1")(x)
        b7 = BasicConv2d(c7, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, name="branch_pool")(_avg_pool_3x3_tf(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # Mixed_7b uses the TF avg pool; Mixed_7c uses MAX pool (pytorch-fid
    # FIDInceptionE_2 — the 2015 TF graph's quirk)
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, name="branch1x1")(x)
        b3 = BasicConv2d(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        pooled = (_max_pool(x, 3, 1, pad=1) if self.pool == "max"
                  else _avg_pool_3x3_tf(x))
        bp = BasicConv2d(192, name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool3_features (N, 2048), logits (N, num_classes)).

    Input: (N, H, W, 3) in [0, 1]; resized to 299x299 bilinear and
    normalized to [-1, 1] internally (pytorch-fid preprocessing)."""

    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x):
        if x.shape[1:3] != (299, 299):
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        x = x * 2.0 - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(pool_features=32, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(channels_7x7=128, name="Mixed_6b")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6c")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6d")(x)
        x = InceptionC(channels_7x7=192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # global avg pool -> "pool_3"
        w = self.param("fc_w", nn.initializers.zeros,
                       (FEATURE_DIM, self.num_classes))
        b = self.param("fc_b", nn.initializers.zeros, (self.num_classes,))
        return feats, feats @ w + b


# ---------------------------------------------------------------------------
# torch state_dict import (torchvision / pytorch-fid naming)


def _conv_params(sd, prefix: str):
    """torchvision BasicConv2d '<prefix>.conv/bn.*' -> our param dict."""
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float32)  # (O, I, kh, kw)
    return {
        "conv": np.transpose(w, (2, 3, 1, 0)),  # -> HWIO
        "bn_scale": np.asarray(sd[f"{prefix}.bn.weight"], np.float32),
        "bn_bias": np.asarray(sd[f"{prefix}.bn.bias"], np.float32),
        "bn_mean": np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32),
        "bn_var": np.asarray(sd[f"{prefix}.bn.running_var"], np.float32),
    }


_BLOCK_BRANCHES = {
    "InceptionA": ["branch1x1", "branch5x5_1", "branch5x5_2",
                   "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                   "branch_pool"],
    "InceptionB": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                   "branch3x3dbl_3"],
    "InceptionC": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                   "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                   "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "InceptionD": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                   "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4",
                   "branch_pool?"],
    "InceptionE": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                   "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                   "branch3x3dbl_3b", "branch_pool"],
}

_GRAPH = [
    ("Conv2d_1a_3x3", None), ("Conv2d_2a_3x3", None), ("Conv2d_2b_3x3", None),
    ("Conv2d_3b_1x1", None), ("Conv2d_4a_3x3", None),
    ("Mixed_5b", "InceptionA"), ("Mixed_5c", "InceptionA"),
    ("Mixed_5d", "InceptionA"), ("Mixed_6a", "InceptionB"),
    ("Mixed_6b", "InceptionC"), ("Mixed_6c", "InceptionC"),
    ("Mixed_6d", "InceptionC"), ("Mixed_6e", "InceptionC"),
    ("Mixed_7a", "InceptionD"), ("Mixed_7b", "InceptionE"),
    ("Mixed_7c", "InceptionE"),
]


def import_inception_state_dict(sd) -> dict:
    """torch state_dict (torchvision inception_v3 / pytorch-fid naming) ->
    flax params for :class:`InceptionV3`."""
    params = {}
    for name, kind in _GRAPH:
        if kind is None:
            params[name] = _conv_params(sd, name)
            continue
        block = {}
        for br in _BLOCK_BRANCHES[kind]:
            br = br.rstrip("?")
            if f"{name}.{br}.conv.weight" in sd:
                block[br] = _conv_params(sd, f"{name}.{br}")
        params[name] = block
    params["fc_w"] = np.transpose(np.asarray(sd["fc.weight"], np.float32))
    params["fc_b"] = np.asarray(sd["fc.bias"], np.float32)
    return params


def load_inception_params(path: Optional[str] = None) -> Optional[dict]:
    """Load + convert torch weights; None when no file is available."""
    path = path or os.environ.get("SHERF_INCEPTION_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return import_inception_state_dict(sd)


def inception_extractor(params: Optional[dict] = None,
                        path: Optional[str] = None,
                        logits: bool = False):
    """(N, H, W, 3) in [0,1] -> (N, 2048) pool3 features (or (N, 1008)
    softmax probs for IS when ``logits``).  None when no weights exist."""
    if params is None:
        params = load_inception_params(path)
    if params is None:
        return None
    net = InceptionV3(num_classes=params["fc_b"].shape[0])

    @jax.jit
    def embed(x):
        feats, lg = net.apply({"params": params}, jnp.asarray(x, jnp.float32))
        return jax.nn.softmax(lg, axis=-1) if logits else feats

    return lambda imgs: np.asarray(embed(imgs))
