"""Swin Transformer backbone (flax.linen, NHWC).

Rebuild of the reference `playground/panoptic_seg/coco/mask2former/.../
backbone/swin.py` (732 LoC): patch embed, shifted-window attention with
relative position bias, patch merging, 4 stages emitting res2..res5-style
maps. The reference's fused CUDA window roll/partition kernel
(`efg/operators/src/window_process/*`) is unnecessary on TPU — XLA fuses
the reshape/roll chain (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_trunc = nn.initializers.truncated_normal(0.02)
# torch LayerNorm default eps (flax default is 1e-6) — needed for
# checkpoint-transplant parity with the reference swin
_ln_eps = 1e-5


def window_partition(x, ws: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x [nW·B, ws², C]; mask [nW, ws², ws²] additive or None."""
        bw, n, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, kernel_init=_trunc, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(bw, n, 3, self.num_heads, hd), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = (q @ k.transpose(0, 1, 3, 2)) * (hd**-0.5)

        rpb_table = self.param(
            "relative_position_bias_table", _trunc,
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, -1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, n, self.dim)
        return nn.Dense(self.dim, kernel_init=_trunc, name="proj")(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference swin.py `drop_path`)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, mask_shape)
        return x * mask.astype(x.dtype) / keep


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # the reference port keeps the configured window size and shift at
        # every map size, padding to window multiples and masking wrapped
        # regions (swin.py:230-243 — it does NOT shrink the window on
        # small maps the way official classification swin does)
        ws = self.window_size
        shift = self.shift

        # pad to window multiples (reference pads with F.pad, crops after)
        hp, wp = -(-h // ws) * ws, -(-w // ws) * ws

        shortcut = x
        x = nn.LayerNorm(epsilon=_ln_eps, name="norm1")(x)
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            # attention mask for wrapped windows (built over the padded map)
            img_mask = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws)[..., 0]  # [nW, ws²]
            attn_mask = jnp.where(mw[:, :, None] != mw[:, None, :], -100.0, 0.0)
        else:
            attn_mask = None

        windows = window_partition(x, ws)
        attended = WindowAttention(self.dim, self.num_heads, ws, name="attn")(windows, attn_mask)
        x = window_reverse(attended, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w]
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, train)

        y = nn.LayerNorm(epsilon=_ln_eps, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=_trunc, name="fc1")(y)
        y = nn.Dense(self.dim, kernel_init=_trunc, name="fc2")(jax.nn.gelu(y, approximate=False))
        return x + dp(y, train)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:  # reference pads odd maps before merging
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=_ln_eps, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, kernel_init=_trunc, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T by default (embed 96, depths 2/2/6/2, heads 3/6/12/24)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    drop_path_rate: float = 0.0  # reference M2F-Swin config: 0.3
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    ape: bool = False  # absolute position embedding (reference swin.py:490)
    pretrain_img_size: int = 224

    @nn.compact
    def __call__(self, images, train: bool) -> Dict[str, jax.Array]:
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=self.patch_size, kernel_init=_trunc, name="patch_embed",
        )(images)
        x = nn.LayerNorm(epsilon=_ln_eps, name="patch_norm")(x)
        if self.ape:
            # APE lives at the pretrain patch resolution and is resized to
            # the actual map (reference swin.py forward: F.interpolate
            # bicubic, applied AFTER the patch-embed norm); stored NHWC
            hp0 = self.pretrain_img_size // self.patch_size
            pos = self.param(
                "absolute_pos_embed", _trunc, (1, hp0, hp0, self.embed_dim)
            )
            if pos.shape[1:3] != x.shape[1:3]:
                pos = jax.image.resize(
                    pos, (1, x.shape[1], x.shape[2], self.embed_dim),
                    method="cubic",
                )
            x = x + pos

        # linear stochastic-depth schedule over the flattened block index
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]

        outputs: Dict[str, jax.Array] = {}
        dim = self.embed_dim
        blk_i = 0
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for blk in range(depth):
                x = SwinBlock(
                    dim, heads, self.window_size,
                    shift=0 if blk % 2 == 0 else self.window_size // 2,
                    drop_path=dpr[blk_i],
                    name=f"stage{stage}_block{blk}",
                )(x, train)
                blk_i += 1
            name = f"res{stage + 2}"
            if name in self.out_features:
                outputs[name] = nn.LayerNorm(epsilon=_ln_eps, name=f"out_norm{stage}")(x)
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"merge{stage}")(x)
                dim *= 2
        return outputs
