"""Result post-processing + mask pasting (device-side).

Rebuild of `efg/modeling/post_processing/postprocessing.py:7-103`
(`detector_postprocess`, `sem_seg_postprocess`) and
`efg/modeling/modules/mask_ops.py` (`paste_masks_in_image`) for the
fixed-shape NHWC pipeline.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def detector_postprocess(boxes: jax.Array, scale: float, image_size: Tuple[int, int]):
    """Rescale xyxy boxes back to the original image and clip
    (reference `detector_postprocess`)."""
    h, w = image_size
    boxes = boxes / scale
    x = jnp.clip(boxes[..., 0::2], 0, w)
    y = jnp.clip(boxes[..., 1::2], 0, h)
    return jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)


def sem_seg_postprocess(logits: jax.Array, out_size: Tuple[int, int]):
    """[C, h, w] → bilinear-resized [C, H, W] (reference
    `sem_seg_postprocess`)."""
    c = logits.shape[0]
    return jax.image.resize(logits, (c, out_size[0], out_size[1]), "bilinear")


def paste_masks_in_image(
    masks: jax.Array,      # [N, S, S] mask logits/probs in box-local coords
    boxes: jax.Array,      # [N, 4] xyxy
    image_size: Tuple[int, int],
    threshold: float = 0.5,
) -> jax.Array:
    """Paste per-box masks onto the image canvas [N, H, W] bool
    (reference `paste_masks_in_image`, `mask_ops.py`). Implemented as an
    inverse bilinear sample at every output pixel — fixed shapes, vmap."""
    h, w = image_size
    s = masks.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5

    def one(mask, box):
        x0, y0, x1, y1 = box
        gx = (xs - x0) / jnp.maximum(x1 - x0, 1e-4) * s - 0.5
        gy = (ys - y0) / jnp.maximum(y1 - y0, 1e-4) * s - 0.5
        x0i = jnp.floor(gx)
        y0i = jnp.floor(gy)
        out = jnp.zeros((h, w), masks.dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                xi = jnp.clip(x0i + dx, 0, s - 1).astype(jnp.int32)
                yi = jnp.clip(y0i + dy, 0, s - 1).astype(jnp.int32)
                wx = 1 - jnp.abs(gx - (x0i + dx))
                wy = 1 - jnp.abs(gy - (y0i + dy))
                out = out + mask[yi[:, None], xi[None, :]] * (wy[:, None] * wx[None, :])
        inside = (
            (xs[None, :] >= x0) & (xs[None, :] < x1)
            & (ys[:, None] >= y0) & (ys[:, None] < y1)
        )
        return (out > threshold) & inside

    return jax.vmap(one)(masks, boxes)
