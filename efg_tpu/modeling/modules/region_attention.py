"""Region-to-local attention modules (flax.linen).

Rebuild of `efg/modeling/modules/region_attention/region_to_local.py:
15-130`, `attention/attention2d.py:8-127`, `attention_variants.py:70-111`:
2D attention over flattened windows, attention with learned relative
position bias, and the region→local cross-attention + FFN block.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Attention2d(nn.Module):
    """MHA over flattened spatial tokens (reference `Attention2d`)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, q_tokens, kv_tokens, mask=None):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, name="mha"
        )(q_tokens, inputs_k=kv_tokens, inputs_v=kv_tokens, mask=mask)
        return attn


class AttentionWithRelPos(nn.Module):
    """Window attention with a learned relative-position bias table
    (reference `attention_variants.py:70-111`, Swin-style)."""

    dim: int
    num_heads: int = 8
    window_size: Tuple[int, int] = (7, 7)

    @nn.compact
    def __call__(self, tokens):
        """tokens [B, ws·ws, C] (one window per batch row)."""
        import numpy as np

        wh, ww = self.window_size
        n = wh * ww
        b = tokens.shape[0]
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(tokens).reshape(
            b, n, 3, self.num_heads, hd
        )
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = (q @ k.transpose(0, 1, 3, 2)) * hd**-0.5

        coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
        rel += [wh - 1, ww - 1]
        idx = rel[..., 0] * (2 * ww - 1) + rel[..., 1]
        table = self.param(
            "rel_pos_table", nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, self.num_heads)
        attn = jax.nn.softmax(attn + bias.transpose(2, 0, 1)[None], -1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class R2LAttentionPlusFFN(nn.Module):
    """Region-to-local cross attention + FFN (reference
    `region_to_local.py:15-130`): region tokens attend into their local
    window's pixel tokens, then an FFN refines."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, region_tokens, local_tokens, mask=None):
        """region_tokens [B, R, C], local_tokens [B, L, C]."""
        x = nn.LayerNorm(name="norm1")(region_tokens)
        kv = nn.LayerNorm(name="norm_kv")(local_tokens)
        x = region_tokens + Attention2d(self.dim, self.num_heads, name="attn")(x, kv, mask)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.Dense(self.dim, name="fc2")(jax.nn.gelu(y))
        return x + y
