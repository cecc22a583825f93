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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., n, dim) with a SMALL static token count n (3 planes).

        The token/head axes are unrolled in Python so every array stays
        (..., heads*dim_head)-shaped: with millions of points in the batch
        dims, materializing (..., h, n, n) attention tensors would be padded
        ~50x by TPU (8,128) tiling.  Unrolled, everything is VPU-friendly.
        """
        n = x.shape[-2]
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        scale = self.dim_head ** -0.5

        def split_heads(t):  # (..., inner) -> (..., h, d)
            return t.reshape(*t.shape[:-1], self.heads, self.dim_head)

        q = [split_heads(qkv[..., i, :inner]) for i in range(n)]
        k = [split_heads(qkv[..., i, inner: 2 * inner]) for i in range(n)]
        v = [split_heads(qkv[..., i, 2 * inner:]) for i in range(n)]

        outs = []
        for i in range(n):
            # logits over the n tokens: each is (..., h)
            logits = [jnp.sum(q[i] * k[j], axis=-1) * scale for j in range(n)]
            m = logits[0]
            for l in logits[1:]:
                m = jnp.maximum(m, l)
            exps = [jnp.exp(l - m) for l in logits]
            denom = sum(exps)
            o = sum((e / denom)[..., None] * v[j] for j, e in enumerate(exps))
            outs.append(o.reshape(*o.shape[:-2], inner))
        out = jnp.stack(outs, axis=-2)  # (..., n, inner)
        if self.heads == 1 and self.dim_head == self.dim:
            return out
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int = 32
    hidden: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class PlaneTransformer(nn.Module):
    """PreNorm attention + PreNorm MLP, both residual (reference
    Transformer/Residual/PreNorm, renderer.py:920-993)."""

    dim: int = 32
    depth: int = 1
    heads: int = 3
    dim_head: int = 16
    mlp_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., n_tokens, dim)."""
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"attn_norm_{i}")(x)
            x = x + Attention(self.dim, self.heads, self.dim_head, self.dtype, name=f"attn_{i}")(h)
            h = nn.LayerNorm(name=f"ff_norm_{i}")(x)
            x = x + FeedForward(self.dim, self.mlp_dim, self.dtype, name=f"ff_{i}")(h)
        return x
