"""Configurable BEV RPN neck (flax.linen, NHWC).

Rebuild of reference `RPN` (`efg/modeling/backbones/configurable_rpn.py:
13-123`): per-scale downsample blocks (strided 3×3 conv + `layer_num`
3×3 convs, BN+ReLU) and upsample deblocks (ConvTranspose or strided conv)
whose outputs concatenate into the final BEV feature map.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_conv_init = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")


class _ConvBNReLU(nn.Module):
    features: int
    stride: int = 1
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        # bf16 conv compute (params stay f32): v5e MXU runs f32 at 1/4 the
        # bf16 rate; BN keeps f32 statistics
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, kernel_init=_conv_init,
            dtype=jnp.bfloat16,
        )(x)
        x = nn.BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_eps,
                         use_running_average=not train, dtype=jnp.float32)(x)
        return jax.nn.relu(x)


class RPN(nn.Module):
    layer_nums: Sequence[int] = (5, 5)
    ds_layer_strides: Sequence[int] = (1, 2)
    ds_num_filters: Sequence[int] = (128, 256)
    us_layer_strides: Sequence[int] = (1, 2)
    us_num_filters: Sequence[int] = (256, 256)
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5

    @property
    def num_channels(self) -> int:
        return sum(self.us_num_filters)

    @nn.compact
    def __call__(self, x, train: bool):
        assert len(self.layer_nums) == len(self.ds_layer_strides) == len(self.ds_num_filters)
        upsample_start = len(self.layer_nums) - len(self.us_layer_strides)
        ups = []
        bn_kw = dict(bn_momentum=self.bn_momentum, bn_eps=self.bn_eps)
        for i, n_layers in enumerate(self.layer_nums):
            x = _ConvBNReLU(self.ds_num_filters[i], stride=self.ds_layer_strides[i],
                            name=f"block{i}_in", **bn_kw)(x, train)
            for j in range(n_layers):
                x = _ConvBNReLU(self.ds_num_filters[i], name=f"block{i}_conv{j}", **bn_kw)(x, train)
            ui = i - upsample_start
            if ui >= 0:
                stride = self.us_layer_strides[ui]
                if stride > 1:
                    u = nn.ConvTranspose(
                        self.us_num_filters[ui], (stride, stride), strides=(stride, stride),
                        padding="VALID", use_bias=False, kernel_init=_conv_init,
                        dtype=jnp.bfloat16, name=f"deblock{ui}_deconv",
                    )(x)
                else:
                    s = int(round(1 / stride))
                    u = nn.Conv(
                        self.us_num_filters[ui], (s, s), strides=(s, s),
                        padding="VALID", use_bias=False, kernel_init=_conv_init,
                        dtype=jnp.bfloat16, name=f"deblock{ui}_conv",
                    )(x)
                u = nn.BatchNorm(
                    momentum=self.bn_momentum, epsilon=self.bn_eps,
                    use_running_average=not train, name=f"deblock{ui}_bn",
                )(u)
                ups.append(jax.nn.relu(u))
        return jnp.concatenate(ups, axis=-1) if ups else x


class RPNFixBNMom(RPN):
    """Reference `RPNFixBNMom` (`efg/modeling/backbones/configurable_rpn.py:
    125-137`): same topology with hardcoded BN eps=1e-3, torch momentum=0.01
    (new-stats weight) → flax EMA decay 0.99."""

    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
