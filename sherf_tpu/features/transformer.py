"""Tri-plane token transformer (reference renderer.py:920-993).

A depth-1, 3-head attention over the 3 plane-feature tokens of each sample
point: tiny matmuls, but millions of them — phrased so the point dimension
is the batch dimension and XLA maps everything onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Attention(nn.Module):
    dim: int = 32
    heads: int = 3
    dim_head: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., n, dim)."""
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (..., n, inner) -> (..., h, n, d)
            t = t.reshape(*t.shape[:-1], self.heads, self.dim_head)
            return jnp.swapaxes(t, -2, -3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("...hid,...hjd->...hij", q, k) * (self.dim_head ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("...hij,...hjd->...hid", attn, v)
        out = jnp.swapaxes(out, -2, -3).reshape(*x.shape[:-1], inner)
        if self.heads == 1 and self.dim_head == self.dim:
            return out
        return nn.Dense(self.dim, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int = 32
    hidden: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="fc1")(x)
        h = nn.gelu(h)
        return nn.Dense(self.dim, name="fc2")(h)


class PlaneTransformer(nn.Module):
    """PreNorm attention + PreNorm MLP, both residual (reference
    Transformer/Residual/PreNorm, renderer.py:920-993)."""

    dim: int = 32
    depth: int = 1
    heads: int = 3
    dim_head: int = 16
    mlp_dim: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., n_tokens, dim)."""
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"attn_norm_{i}")(x)
            x = x + Attention(self.dim, self.heads, self.dim_head, name=f"attn_{i}")(h)
            h = nn.LayerNorm(name=f"ff_norm_{i}")(x)
            x = x + FeedForward(self.dim, self.mlp_dim, name=f"ff_{i}")(h)
        return x
