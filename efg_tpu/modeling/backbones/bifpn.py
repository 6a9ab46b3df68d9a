"""BiFPN: bidirectional feature pyramid with fast normalized fusion.

Rebuild of `efg/modeling/backbones/bifpn.py` (359 LoC): top-down +
bottom-up passes over p3–p7 with learnable positive fusion weights
(fast-attention normalization) and depthwise-separable fusion convs.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class SeparableConvBlock(nn.Module):
    """Depthwise + pointwise conv with BN (reference
    `efg/modeling/common/blocks.py` `SeparableConvBlock`)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                    use_bias=False, name="depthwise")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=True, name="pointwise")(x)
        return nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                            use_running_average=not train, name="bn")(x)


def _fuse(inputs: List[jax.Array], weights: jax.Array, eps: float = 1e-4):
    w = jax.nn.relu(weights)
    w = w / (w.sum() + eps)
    return sum(wi * x for wi, x in zip(w, inputs))


class BiFPNLayer(nn.Module):
    features: int = 160

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool) -> List[jax.Array]:
        n = len(feats)  # p3..p7, high→low resolution
        # top-down
        td = [None] * n
        td[n - 1] = feats[n - 1]
        for i in range(n - 2, -1, -1):
            w = self.param(f"w_td{i}", nn.initializers.ones, (2,))
            up = jax.image.resize(td[i + 1], feats[i].shape, "nearest")
            td[i] = SeparableConvBlock(self.features, name=f"conv_td{i}")(
                jax.nn.silu(_fuse([feats[i], up], w)), train
            )
        # bottom-up
        out = [None] * n
        out[0] = td[0]
        for i in range(1, n):
            ins = [feats[i], td[i], nn.max_pool(out[i - 1], (3, 3), strides=(2, 2), padding="SAME")]
            if i == n - 1:
                ins = ins[:1] + ins[2:]  # top level has no separate td path
            w = self.param(f"w_bu{i}", nn.initializers.ones, (len(ins),))
            out[i] = SeparableConvBlock(self.features, name=f"conv_bu{i}")(
                jax.nn.silu(_fuse(ins, w)), train
            )
        return out


class BiFPN(nn.Module):
    """Resample res3-5 → p3-p7 then `num_layers` BiFPN layers."""

    features: int = 160
    num_layers: int = 6
    in_features: Sequence[str] = ("res3", "res4", "res5")

    @nn.compact
    def __call__(self, backbone_feats: Dict[str, jax.Array], train: bool) -> List[jax.Array]:
        feats = []
        for f in self.in_features:
            x = nn.Conv(self.features, (1, 1), name=f"lateral_{f}")(backbone_feats[f])
            x = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                             use_running_average=not train, name=f"lateral_bn_{f}")(x)
            feats.append(x)
        p5 = feats[-1]
        p6 = nn.max_pool(
            nn.Conv(self.features, (1, 1), name="p6_conv")(p5), (3, 3),
            strides=(2, 2), padding="SAME",
        )
        p7 = nn.max_pool(p6, (3, 3), strides=(2, 2), padding="SAME")
        feats = feats + [p6, p7]
        for i in range(self.num_layers):
            feats = BiFPNLayer(self.features, name=f"layer{i}")(feats, train)
        return feats
