"""Deformable convolution v1/v2 as gather + matmul (NHWC, jit).

TPU-native replacement for the reference CUDA extension
(`efg/operators/src/deform_conv/*`, wrapper `efg/operators/deform_conv.py:
15-469`): for every output location and kernel tap, sample the input at
`base + offset` bilinearly (v2 additionally multiplies a modulation mask),
then contract taps × channels on the MXU. Offsets/masks come from a
regular conv, as in the reference modules.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def deform_conv2d(
    x: jax.Array,          # [B, H, W, Cin]
    offsets: jax.Array,    # [B, Ho, Wo, K*2] (dy, dx per tap)
    weights: jax.Array,    # [kh, kw, Cin, Cout]
    *,
    stride: int = 1,
    padding: int = 1,
    modulation: Optional[jax.Array] = None,  # [B, Ho, Wo, K] (v2 mask)
) -> jax.Array:
    b, h, w, cin = x.shape
    kh, kw, _, cout = weights.shape
    k = kh * kw
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1

    oy, ox = jnp.meshgrid(
        jnp.arange(ho, dtype=x.dtype) * stride - padding,
        jnp.arange(wo, dtype=x.dtype) * stride - padding,
        indexing="ij",
    )
    ky, kx = jnp.meshgrid(
        jnp.arange(kh, dtype=x.dtype), jnp.arange(kw, dtype=x.dtype), indexing="ij"
    )
    base_y = oy[:, :, None] + ky.reshape(-1)  # [Ho, Wo, K]
    base_x = ox[:, :, None] + kx.reshape(-1)

    off = offsets.reshape(b, ho, wo, k, 2)
    gy = base_y[None] + off[..., 0]
    gx = base_x[None] + off[..., 1]

    def sample(img, yy, xx):
        """img [H, W, Cin]; yy/xx [Ho, Wo, K] → [Ho, Wo, K, Cin]."""
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi = y0 + dy
                xi = x0 + dx
                wgt = (1 - jnp.abs(yy - yi)) * (1 - jnp.abs(xx - xi))
                ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
                out = out + img[yc, xc] * (wgt * ok)[..., None]
        return out

    sampled = jax.vmap(sample)(x, gy, gx)  # [B, Ho, Wo, K, Cin]
    if modulation is not None:
        sampled = sampled * jax.nn.sigmoid(modulation)[..., None]
    return jnp.einsum(
        "bhwkc,kco->bhwo", sampled, weights.reshape(k, cin, cout),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


class DeformConv(nn.Module):
    """v1 deformable conv layer (offset conv + deform sampling)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    modulated: bool = False  # True = v2 (ModulatedDeformConv)

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size**2
        off_ch = k * 3 if self.modulated else k * 2
        off = nn.Conv(
            off_ch, (self.kernel_size, self.kernel_size), strides=self.stride,
            padding=self.kernel_size // 2,
            kernel_init=nn.initializers.zeros, name="offset_conv",
        )(x)
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        if self.modulated:
            offsets, mask = off[..., : 2 * k], off[..., 2 * k :]
        else:
            offsets, mask = off, None
        return deform_conv2d(
            x, offsets, w, stride=self.stride,
            padding=self.kernel_size // 2, modulation=mask,
        )


ModulatedDeformConv = lambda features, **kw: DeformConv(features, modulated=True, **kw)  # noqa: E731
