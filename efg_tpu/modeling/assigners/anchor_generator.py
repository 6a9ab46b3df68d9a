"""Anchor generation + box transforms (device-side jnp).

Rebuild of `efg/modeling/assigners/anchor_generator.py:59-196` and
`box_regression.py` (`Box2BoxTransform`): dense multi-level anchors and the
standard (dx, dy, dw, dh) delta codec used by RetinaNet.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp


def generate_cell_anchors(sizes, aspect_ratios) -> jnp.ndarray:
    """[A, 4] xyxy anchors centered at the origin (reference
    `DefaultAnchorGenerator.generate_cell_anchors`)."""
    anchors = []
    for size in sizes:
        area = size**2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return jnp.asarray(anchors, jnp.float32)


def grid_anchors(
    shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes_per_level: Sequence[Sequence[float]],
    aspect_ratios: Sequence[float],
) -> List[jnp.ndarray]:
    """Per-level anchors [(H·W·A, 4) ...]."""
    out = []
    for (h, w), stride, sizes in zip(shapes, strides, sizes_per_level):
        cell = generate_cell_anchors(sizes, aspect_ratios)  # [A, 4]
        ys, xs = jnp.meshgrid(
            (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride,
            (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride,
            indexing="ij",
        )
        shift = jnp.stack([xs, ys, xs, ys], axis=-1).reshape(-1, 1, 4)
        out.append((shift + cell[None]).reshape(-1, 4))
    return out


class Box2BoxTransform:
    """(dx, dy, dw, dh) codec (reference `box_regression.py`)."""

    def __init__(self, weights=(1.0, 1.0, 1.0, 1.0), scale_clamp=math.log(1000.0 / 16)):
        self.weights = weights
        self.scale_clamp = scale_clamp

    def get_deltas(self, src, target):
        sw = src[..., 2] - src[..., 0]
        sh = src[..., 3] - src[..., 1]
        scx = src[..., 0] + sw / 2
        scy = src[..., 1] + sh / 2
        tw = target[..., 2] - target[..., 0]
        th = target[..., 3] - target[..., 1]
        tcx = target[..., 0] + tw / 2
        tcy = target[..., 1] + th / 2
        wx, wy, ww, wh = self.weights
        return jnp.stack(
            [
                wx * (tcx - scx) / jnp.maximum(sw, 1e-6),
                wy * (tcy - scy) / jnp.maximum(sh, 1e-6),
                ww * jnp.log(jnp.maximum(tw, 1e-6) / jnp.maximum(sw, 1e-6)),
                wh * jnp.log(jnp.maximum(th, 1e-6) / jnp.maximum(sh, 1e-6)),
            ],
            axis=-1,
        )

    def apply_deltas(self, deltas, boxes):
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        cx = boxes[..., 0] + w / 2
        cy = boxes[..., 1] + h / 2
        wx, wy, ww, wh = self.weights
        dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
        dw = jnp.clip(deltas[..., 2] / ww, None, self.scale_clamp)
        dh = jnp.clip(deltas[..., 3] / wh, None, self.scale_clamp)
        pcx = dx * w + cx
        pcy = dy * h + cy
        pw = jnp.exp(dw) * w
        ph = jnp.exp(dh) * h
        return jnp.stack(
            [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], axis=-1
        )
