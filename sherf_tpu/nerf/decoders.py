"""NeRF decoders (reference triplane.py:242-316).

The production path (all shipped configs) is NeRFDecoder: an 8x128 MLP with
a skip at layer 4 and a view-conditioned rgb branch.  OSGDecoder is EG3D's
default 2-layer softplus head, kept for the use_nerf_decoder=False branch.
Both are pure matmul stacks — the points dimension is the batch and maps
straight onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sherf_tpu.features.stylegan2 import EqualDense

SIGMOID_WIDEN = 0.001  # MipNeRF sigmoid widening (triplane.py:263,314)


class OSGDecoder(nn.Module):
    """(triplane.py:242-265): mean over planes -> 64-wide softplus MLP."""

    hidden_dim: int = 64
    out_dim: int = 3
    lr_multiplier: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sampled_features: jnp.ndarray, ray_directions=None):
        """sampled_features: (n_planes, N, C) -> dict(rgb (N,3), sigma (N,1))."""
        x = jnp.mean(sampled_features, axis=0).astype(self.dtype)
        x = EqualDense(self.hidden_dim, lr_multiplier=self.lr_multiplier,
                       name="fc0")(x)
        x = nn.softplus(x)
        x = EqualDense(1 + self.out_dim, lr_multiplier=self.lr_multiplier,
                       name="fc1")(x)
        x = x.astype(jnp.float32)
        rgb = nn.sigmoid(x[..., 1:]) * (1 + 2 * SIGMOID_WIDEN) - SIGMOID_WIDEN
        return {"rgb": rgb, "sigma": x[..., 0:1]}


class NeRFDecoder(nn.Module):
    """(triplane.py:267-316): pts branch = posenc(39) + plane-0 feature (32);
    view branch = feature(128) + viewenc(27) + plane-1 feature (32)."""

    width: int = 128
    n_features: int = 32
    skips: tuple = (4,)
    with_viewdirs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts_enc: jnp.ndarray, sampled_features: jnp.ndarray,
                 view_enc: jnp.ndarray):
        """pts_enc: (N, 39); sampled_features: (n_planes, N, 32);
        view_enc: (N, 27)."""
        feat0 = sampled_features[0].astype(self.dtype)
        feat1 = sampled_features[1].astype(self.dtype)
        pts_enc = pts_enc.astype(self.dtype)
        view_enc = view_enc.astype(self.dtype)

        x = jnp.concatenate([pts_enc, feat0], axis=-1)
        h = x
        for i in range(8):
            h = nn.Dense(self.width, dtype=self.dtype, name=f"pts_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)

        sigma = nn.Dense(1, dtype=self.dtype, name="alpha")(h).astype(jnp.float32)
        feature = nn.Dense(self.width, dtype=self.dtype, name="feature")(h)

        if self.with_viewdirs:
            h = jnp.concatenate([feature, view_enc, feat1], axis=-1)
        else:
            h = jnp.concatenate([feature, feat1], axis=-1)
        h = nn.Dense(self.width // 2, dtype=self.dtype, name="views")(h)
        h = nn.relu(h)
        rgb = nn.Dense(3, dtype=self.dtype, name="rgb")(h).astype(jnp.float32)
        rgb = nn.sigmoid(rgb) * (1 + 2 * SIGMOID_WIDEN) - SIGMOID_WIDEN
        return {"rgb": rgb, "sigma": sigma}
