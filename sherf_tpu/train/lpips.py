"""LPIPS perceptual distance (VGG16 backbone) in flax.

The reference uses the ``lpips`` torch package for both the training loss
(loss.py:28,160) and eval metrics (test_loop.py:40).  This is the same
computation natively: VGG16 conv features at 5 stages, unit-normalized per
channel, squared differences reduced by learned 1x1 linear weights, spatial
mean, summed over stages.

Weights are NOT bundled (no network egress here); convert them from the
torch ``lpips`` package checkpoint with :func:`import_lpips_torch` when
available.  Callers should check :func:`lpips_available` and skip the term
otherwise (the loss/eval code does).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

# VGG16 'D' configuration; LPIPS taps the relu outputs marked by stage ends.
_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
_STAGE_ENDS = (1, 3, 6, 9, 12)  # conv indices of relu1_2/2_2/3_3/4_3/5_3
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv stack returning the 5 LPIPS feature stages (NHWC)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        feats = []
        conv_idx = 0
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(int(v), (3, 3), padding=1, name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                if conv_idx in _STAGE_ENDS:
                    feats.append(x)
                conv_idx += 1
        return feats


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') equivalent.  Inputs in [-1, 1], NHWC."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        vgg = VGG16Features(name="vgg")
        xn = (x - _SHIFT) / _SCALE
        yn = (y - _SHIFT) / _SCALE
        fx = vgg(xn)
        fy = vgg(yn)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total  # (B,)


def import_lpips_state_dict(sd: Dict) -> Dict:
    """torch lpips.LPIPS(net='vgg') state_dict (numpy values, full model
    incl. the VGG backbone under net.sliceN.*) -> our param tree."""
    params: Dict = {"vgg": {}}
    # torchvision vgg16.features indices of the conv layers
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, t in enumerate(tv_conv_idx):
        params["vgg"][f"conv{i}"] = {
            "kernel": jnp.asarray(np.transpose(_tv_key(sd, t, "weight"), (2, 3, 1, 0))),
            "bias": jnp.asarray(_tv_key(sd, t, "bias")),
        }
    for i in range(5):
        w = sd[f"lins.{i}.model.1.weight"]  # (1, C, 1, 1)
        params[f"lin{i}"] = jnp.asarray(w[0, :, 0, 0])
    return params


def import_lpips_torch(lpips_module=None) -> Optional[Dict]:
    """Convert the torch ``lpips`` package's VGG LPIPS to our param tree.
    Returns None when torch/lpips (or its weights) are unavailable."""
    try:
        if lpips_module is None:
            import lpips as lpips_module  # type: ignore
        import torch  # noqa: F401
        net = lpips_module.LPIPS(net="vgg")
    except Exception:
        return None

    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    return import_lpips_state_dict(sd)


def load_lpips_file(path: Optional[str] = None) -> Optional[Dict]:
    """Load a saved torch state_dict of lpips.LPIPS(net='vgg') — the
    no-egress path: dump it once on a machine with the lpips package
    (``torch.save(lpips.LPIPS(net='vgg').state_dict(), f)``) and point
    ``SHERF_LPIPS_WEIGHTS`` here."""
    import os

    path = path or os.environ.get("SHERF_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return import_lpips_state_dict(sd)


def _tv_key(sd, idx, kind):
    # lpips stores the backbone as net.sliceN.<idx>.<kind>
    for n in range(1, 6):
        k = f"net.slice{n}.{idx}.{kind}"
        if k in sd:
            return sd[k]
    raise KeyError(f"vgg conv {idx}.{kind} not found in lpips state dict")


_LPIPS_PARAMS: Optional[Dict] = None
_TRIED = False


def lpips_params() -> Optional[Dict]:
    global _LPIPS_PARAMS, _TRIED
    if not _TRIED:
        _TRIED = True
        _LPIPS_PARAMS = load_lpips_file() or import_lpips_torch()
    return _LPIPS_PARAMS


def lpips_available() -> bool:
    return lpips_params() is not None
