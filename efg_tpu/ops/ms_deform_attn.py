"""Multi-scale deformable attention sampling (Deformable-DETR style).

TPU-native replacement for the reference CUDA kernel
(`efg/operators/src/deform_attn/ms_deform_im2col_cuda.cuh`, wrapper
`efg/operators/ms_deform_attn.py:24-198`): per-(query, head, level, point)
offsets around reference points, bilinear sampling, softmax-weighted sum.
The reference ships a pure-torch mirror (`ms_deform_attn_core_pytorch`,
`:55-77`) that this matches semantically. Reuses the fused
gather-accumulate core of the box-attention op.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from efg_tpu.ops.box_attention import _bilinear_gather


def ms_deform_attn_sample(
    value_levels: Sequence[jax.Array],   # list of [B, H_l, W_l, C]
    sampling_locations: jax.Array,       # [B, L, NH, NL, P, 2] normalized
    attn_weights: jax.Array,             # [B, L, NH, NL, P] softmaxed over NL*P
    *,
    num_heads: int,
) -> jax.Array:
    """→ [B, L, C]. Identical contract to the reference CUDA forward."""
    b, l, nh, nlvl, p, _ = sampling_locations.shape
    c = value_levels[0].shape[-1]
    hd = c // num_heads
    out = jnp.zeros((b, l, nh, hd), dtype=value_levels[0].dtype)
    for lvl, vmap_ in enumerate(value_levels):
        h, w = vmap_.shape[1:3]
        flat = vmap_.reshape(b, h * w, c)
        for pi in range(p):
            gx = sampling_locations[:, :, :, lvl, pi, 0] * w - 0.5
            gy = sampling_locations[:, :, :, lvl, pi, 1] * h - 0.5
            sampled = _bilinear_gather(flat, gx, gy, h, w)
            out = out + sampled * attn_weights[:, :, :, lvl, pi, None].astype(out.dtype)
    return out.reshape(b, l, c)
