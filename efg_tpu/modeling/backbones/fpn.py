"""Feature Pyramid Network (dense, NHWC, flax.linen).

Rebuild of reference `FPN` (`efg/modeling/backbones/fpn.py:71-190`):
lateral 1×1 + top-down nearest upsample + 3×3 output convs, optional
LastLevelMaxPool top block. Used both on 2D ResNets and on top of the
sparse ResNet's BEV maps (the 3D-DETR path, `fpn.py:18-37`).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_uniform()


class FPN(nn.Module):
    in_features: Sequence[str] = ("res2", "res3", "res4")
    out_channels: int = 256
    norm: str = "BN"
    fuse_type: str = "sum"
    top_block: bool = True  # LastLevelMaxPool from the last output

    @nn.compact
    def __call__(self, features: Dict[str, jax.Array], train: bool) -> Dict[str, jax.Array]:
        names = list(self.in_features)  # high→low resolution order
        # strides assumed log2-contiguous; output names p<stage> follow input order
        first_stage = None
        results: Dict[str, jax.Array] = {}

        def norm_layer(name):
            if self.norm in ("BN", "SyncBN"):
                return nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                    use_running_average=not train, name=name)
            if self.norm == "GN":
                return nn.GroupNorm(num_groups=32, name=name)
            return lambda x: x

        prev = None
        outs = []
        for i, f in enumerate(reversed(names)):  # low resolution first
            lat = nn.Conv(self.out_channels, (1, 1), use_bias=self.norm == "",
                          kernel_init=_xavier, name=f"lateral_{f}")(features[f])
            if self.norm:
                lat = norm_layer(f"lateral_{f}_norm")(lat)
            if prev is None:
                prev = lat
            else:
                b, h, w, c = prev.shape
                up = jax.image.resize(prev, (b, h * 2, w * 2, c), method="nearest")
                prev = lat + up
                if self.fuse_type == "avg":
                    prev = prev / 2
            out = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=self.norm == "",
                          kernel_init=_xavier, name=f"output_{f}")(prev)
            if self.norm:
                out = norm_layer(f"output_{f}_norm")(out)
            outs.append((f, out))

        # assign p-names by stage index parsed from resN
        for f, out in outs:
            results[f"p{_stage_of(f)}"] = out
        if self.top_block:
            last_name = f"p{max(_stage_of(f) for f in names)}"
            top = nn.max_pool(results[last_name], (1, 1), strides=(2, 2))
            results[f"p{max(_stage_of(f) for f in names) + 1}"] = top
        return results


def _stage_of(res_name: str) -> int:
    """res2 @ stride 4 → p2... reference maps p-number = log2(stride); the
    sparse backbone's res2 has stride 4 ⇒ p2? Reference `fpn.py:116`:
    stage = log2(in_stride); sparse resnet strides are {res2: 4, res3: 8,
    res4: 16} ⇒ p2/p3/p4."""
    return int(res_name[-1])


class PositionEmbeddingSine(nn.Module):
    """Sine 2D position encoding (reference `modules/position_encoding.py`),
    NHWC output [B, H, W, C]."""

    num_pos_feats: int = 128
    temperature: float = 10000.0
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
        x_embed = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
        if self.normalize:
            eps = 1e-6
            scale = 2 * jnp.pi
            y_embed = (y_embed - 0.5) / (y_embed[-1:, :] + eps) * scale
            x_embed = (x_embed - 0.5) / (x_embed[:, -1:] + eps) * scale
        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)
        pos_x = x_embed[:, :, None] / dim_t
        pos_y = y_embed[:, :, None] / dim_t
        pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
        pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
        pos = jnp.concatenate([pos_y, pos_x], axis=-1)
        return jnp.broadcast_to(pos[None], (b, h, w, pos.shape[-1])).astype(x.dtype)
