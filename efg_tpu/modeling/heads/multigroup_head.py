"""Anchor-based multi-task 3D head (flax.linen, NHWC).

Rebuild of `efg/modeling/heads/mutltigroup_head.py:4-120`: per task a 1×1
conv each for box regression, classification, and (optionally) direction
classification, with 2·num_classes anchors per location.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import jax
from flax import linen as nn


class _Head(nn.Module):
    num_pred: int
    num_cls: int
    num_dir: int = 0
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        out = {
            "box_preds": nn.Conv(self.num_pred, (1, 1), name="conv_box")(x),
            "cls_preds": nn.Conv(
                self.num_cls, (1, 1),
                bias_init=nn.initializers.constant(bias), name="conv_cls",
            )(x),
        }
        if self.num_dir:
            out["dir_cls_preds"] = nn.Conv(self.num_dir, (1, 1), name="conv_dir")(x)
        return out


class MultiGroupHead(nn.Module):
    """tasks: [{"num_classes": n, "class_names": [...]}]; two anchors
    (0°/90°) per class per location, box code size 7 (or 9 w/ velocity)."""

    tasks: Sequence[Dict[str, Any]]
    box_code_size: int = 7
    use_dir: bool = True
    encode_background_as_zeros: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True) -> List[Dict[str, jax.Array]]:
        outs = []
        for t, task in enumerate(self.tasks):
            n_cls = int(task["num_classes"])
            n_anchor = 2 * n_cls
            num_cls = n_anchor * (n_cls if self.encode_background_as_zeros else n_cls + 1)
            outs.append(
                _Head(
                    num_pred=n_anchor * self.box_code_size,
                    num_cls=num_cls,
                    num_dir=n_anchor * 2 if self.use_dir else 0,
                    name=f"task{t}",
                )(x)
            )
        return outs
