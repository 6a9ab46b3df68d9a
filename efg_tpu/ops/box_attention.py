"""Box attention sampling: rotated-box bilinear sampling + weighted sum.

TPU-native replacement for the reference CUDA kernel
(`efg/operators/src/box_attn/box_attn_kernel.cuh`, python wrapper
`efg/operators/box_attention_func.py:10-64`): each (query, head, level)
samples a k×k grid of points inside a rotated box and combines them with
softmax weights. Implemented as XLA gathers accumulated point-by-point so
the [B, L, heads, points, dim] tensor is never materialized; autodiff gives
the backward pass. (A fused Pallas kernel is the planned fast path.)

All feature maps are NHWC; grid coords are normalized [0, 1] per level.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(value: jax.Array, gx: jax.Array, gy: jax.Array, h: int, w: int):
    """value [B, H*W, HD] (flattened per level, head-major channels),
    gx/gy [B, L, NH] in pixel coords → [B, L, NH, head_dim] where value's
    channel dim is NH*head_dim and each head reads its own slice.

    Out-of-range taps contribute zero (matches the CUDA kernel's border
    handling of sampling outside the feature map).
    """
    b, hw, c = value.shape
    nh = gx.shape[-1]
    hd = c // nh
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    out = None
    vv = value.reshape(b, hw, nh, hd)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (1 - jnp.abs(gx - xi)) * (1 - jnp.abs(gy - yi))
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        # gather per head: idx [B, L, NH] into [B, HW, NH, hd]
        g = jnp.take_along_axis(vv, idx[..., None], axis=1)  # [B, L, NH, hd]
        contrib = g * (wgt * ok)[..., None].astype(value.dtype)
        out = contrib if out is None else out + contrib
    return out


def box_attention_sample(
    value_levels: Sequence[jax.Array],
    grids: jax.Array,
    attn_weights: jax.Array,
    *,
    num_heads: int,
) -> jax.Array:
    """Sample and combine.

    value_levels: list of [B, H_l, W_l, C] maps (C = num_heads * head_dim)
    grids:        [B, L, num_heads, num_levels, P, 2] normalized (x, y)
    attn_weights: [B, L, num_heads, num_levels, P] (softmaxed)
    → [B, L, C]
    """
    b, l, nh, nlvl, p, _ = grids.shape
    c = value_levels[0].shape[-1]
    hd = c // num_heads
    out = jnp.zeros((b, l, nh, hd), dtype=value_levels[0].dtype)
    for lvl, vmap_ in enumerate(value_levels):
        h, w = vmap_.shape[1:3]
        flat = vmap_.reshape(b, h * w, c)
        for pi in range(p):
            gx = grids[:, :, :, lvl, pi, 0] * w - 0.5
            gy = grids[:, :, :, lvl, pi, 1] * h - 0.5
            sampled = _bilinear_gather(flat, gx, gy, h, w)  # [B, L, NH, hd]
            out = out + sampled * attn_weights[:, :, :, lvl, pi, None].astype(out.dtype)
    return out.reshape(b, l, c)


def make_box_grids(
    ref_boxes: jax.Array,
    ref_angles: jax.Array,
    offset_boxes: jax.Array,
    offset_angles: jax.Array | None,
    kernel_indices: jax.Array,
) -> jax.Array:
    """Compute normalized sampling grids (reference `_where_to_attend`,
    `box_attention.py:62-95`).

    ref_boxes [B, L, 1|NH, NL, 4] (cx, cy, w, h in [0,1]),
    ref_angles [B, L, 1|NH, NL, 1] (normalized angle in [0,1] × 2π),
    offset_boxes [B, L, NH, NL, 4], offset_angles same or None,
    kernel_indices [P, 2] → grids [B, L, NH, NL, P, 2].
    """
    if offset_angles is not None:
        angles = (ref_angles + offset_angles / 16.0) * 2.0 * jnp.pi
    else:
        angles = ref_angles * 2.0 * jnp.pi
    boxes = ref_boxes + offset_boxes / 8.0 * ref_boxes[..., [2, 3, 2, 3]]
    center, size = boxes[..., :2], boxes[..., 2:]

    cos_a, sin_a = jnp.cos(angles), jnp.sin(angles)  # [..., 1]
    grid = kernel_indices * jax.nn.relu(size)[..., None, :]  # [..., P, 2]
    # row-vector rotation (reference rot_matrix [[c, -s], [s, c]] · grid)
    gx = grid[..., 0] * cos_a - grid[..., 1] * sin_a
    gy = grid[..., 0] * sin_a + grid[..., 1] * cos_a
    rotated = jnp.stack([gx, gy], axis=-1)
    return center[..., None, :] + rotated


def kernel_indices(kernel_size: int, dtype=jnp.float32) -> jax.Array:
    """[P, 2] (x, y) grid offsets in box-fraction units (reference
    `_create_kernel_indices`)."""
    if kernel_size % 2 == 0:
        start = -kernel_size // 2 + 0.5
        end = kernel_size // 2 - 0.5
    else:
        start = -(kernel_size - 1) // 2
        end = (kernel_size - 1) // 2
    idx = jnp.linspace(start, end, kernel_size, dtype=dtype)
    i, j = jnp.meshgrid(idx, idx, indexing="ij")
    return jnp.stack([j, i], axis=-1).reshape(-1, 2) / kernel_size
