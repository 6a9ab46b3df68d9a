"""2D ResNet backbone (flax.linen, NHWC).

Rebuild of the reference detectron2-style ResNet
(`efg/modeling/backbones/resnet.py`, 781 LoC): stem + res2..res5
bottleneck stages, freeze-at, dilation, multi-scale out features. Frozen
BN is the default for detection fine-tuning (reference `FrozenBatchNorm2d`,
`efg/modeling/common/batch_norm.py:16`): affine transform with fixed
statistics — here simply parameters that receive no statistic updates
(optimizers can exclude them via the usual masking).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_msra = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class FrozenBatchNorm(nn.Module):
    """Affine-only normalization with constant running stats (reference
    `FrozenBatchNorm2d`). Stats live in `batch_stats` but are never
    updated."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c)).value
        var = self.variable("batch_stats", "var", lambda: jnp.ones(c)).value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return x * inv + (bias - mean * inv)


def _norm(kind: str, train: bool, name: str):
    if kind == "FrozenBN":
        return FrozenBatchNorm(name=name)
    if kind in ("BN", "SyncBN"):
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_running_average=not train, name=name)
    if kind == "GN":
        return nn.GroupNorm(num_groups=32, name=name)
    raise KeyError(kind)


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    norm: str = "FrozenBN"
    deform: bool = False            # DeformBottleneckBlock (conv2 deformable)
    deform_modulated: bool = False  # v2 (modulated) variant

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=_msra, name="shortcut")(x)
            shortcut = _norm(self.norm, train, "shortcut_norm")(shortcut)
        out = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                      kernel_init=_msra, name="conv1")(x)
        out = jax.nn.relu(_norm(self.norm, train, "norm1")(out))
        if self.deform:
            # reference DeformBottleneckBlock: conv2 becomes a (modulated)
            # deformable conv (`efg/modeling/backbones/resnet.py`
            # deform_on_per_stage wiring)
            assert self.dilation == 1, "deform conv2 does not support dilation"
            from efg_tpu.ops.deform_conv import DeformConv

            out = DeformConv(
                self.bottleneck_channels, kernel_size=3, stride=self.stride,
                modulated=self.deform_modulated, name="conv2",
            )(out)
        else:
            out = nn.Conv(
                self.bottleneck_channels, (3, 3), strides=self.stride,
                kernel_dilation=self.dilation, padding=self.dilation,
                use_bias=False, kernel_init=_msra, name="conv2",
            )(out)
        out = jax.nn.relu(_norm(self.norm, train, "norm2")(out))
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      kernel_init=_msra, name="conv3")(out)
        out = _norm(self.norm, train, "norm3")(out)
        return jax.nn.relu(out + shortcut)


class BasicBlock(nn.Module):
    """Two-3x3-conv residual block for ResNet-18/34 (reference
    `efg/modeling/backbones/resnet.py` BasicBlock)."""

    out_channels: int
    stride: int = 1
    norm: str = "FrozenBN"

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=_msra, name="shortcut")(x)
            shortcut = _norm(self.norm, train, "shortcut_norm")(shortcut)
        out = nn.Conv(self.out_channels, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=_msra, name="conv1")(x)
        out = jax.nn.relu(_norm(self.norm, train, "norm1")(out))
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      use_bias=False, kernel_init=_msra, name="conv2")(out)
        out = _norm(self.norm, train, "norm2")(out)
        return jax.nn.relu(out + shortcut)


class ResNet(nn.Module):
    """ResNet-18/34/50/101 trunk. `freeze_at` stops gradients through early
    stages (reference freeze-at semantics). 18/34 use BasicBlock (channel
    widths 64..512); 50/101 use BottleneckBlock (256..2048)."""

    depth: int = 50
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res3", "res4", "res5")
    freeze_at: int = 2
    res5_dilation: int = 1
    # per-stage deformable conv2 (res2..res5), reference
    # `deform_on_per_stage` / `deform_modulated` (gallary/backbones.yaml)
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False

    @nn.compact
    def __call__(self, x, train: bool) -> Dict[str, jax.Array]:
        blocks_per_stage = {
            18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
            50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
        }[self.depth]
        basic = self.depth in (18, 34)
        # stem
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=_msra, name="stem_conv1")(x)
        x = jax.nn.relu(_norm(self.norm, train, "stem_norm")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        outputs: Dict[str, jax.Array] = {}
        out_ch, bott = (64, 64) if basic else (256, 64)
        for stage_i, n_blocks in enumerate(blocks_per_stage):
            name = f"res{stage_i + 2}"
            first_stride = 1 if stage_i == 0 else 2
            dilation = self.res5_dilation if name == "res5" else 1
            if dilation > 1:
                first_stride = 1
            for b in range(n_blocks):
                if basic:
                    assert not self.deform_on_per_stage[stage_i] and dilation == 1, \
                        "BasicBlock (depth 18/34) supports neither deform nor dilation"
                    x = BasicBlock(
                        out_ch, stride=first_stride if b == 0 else 1,
                        norm=self.norm, name=f"{name}_block{b}",
                    )(x, train)
                    continue
                x = BottleneckBlock(
                    out_ch, bott,
                    stride=first_stride if b == 0 else 1,
                    dilation=dilation, norm=self.norm,
                    deform=bool(self.deform_on_per_stage[stage_i]),
                    deform_modulated=self.deform_modulated,
                    name=f"{name}_block{b}",
                )(x, train)
            if self.freeze_at >= stage_i + 2:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
            out_ch *= 2
            bott *= 2
        return outputs
