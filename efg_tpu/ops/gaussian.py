"""Device-side CenterNet gaussian heatmap rendering.

Vectorized replacement for the reference's per-sample numpy label
assignment inside the model forward (`playground/.../voxelnet.py`
`assign_one` + `center_utils.py` `draw_umich_gaussian`): every GT center
splats a (2r+1)² gaussian window via one scatter-max — jit-able, batched,
deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gaussian_radius_jnp(length, width, min_overlap: float):
    """Per-object CenterNet radius (twin of `geometry.box_ops_np.gaussian_radius`,
    reference `center_utils.py:10-30`), elementwise over arrays."""
    h, w = length, width
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))) / 2

    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


@functools.partial(jax.jit, static_argnames=("shape", "r_cap"))
def splat_gaussians(
    centers_int: jax.Array,
    radii: jax.Array,
    cats: jax.Array,
    mask: jax.Array,
    *,
    shape,
    r_cap: int = 12,
) -> jax.Array:
    """Render max-combined gaussians onto a heatmap.

    centers_int [G, 2] int (x, y) in feature-map pixels, radii [G] int,
    cats [G] class channel, mask [G] valid. shape = (H, W, C). Radii are
    clipped to `r_cap` (window is (2*r_cap+1)²). Matches
    `draw_umich_gaussian`: value = exp(-(dx²+dy²)/(2σ²)), σ = (2r+1)/6,
    window limited to |dx|,|dy| ≤ r, combined with max.
    """
    h, w, c = shape
    g = centers_int.shape[0]
    r = jnp.clip(radii, 0, r_cap)
    win = 2 * r_cap + 1
    d = jnp.arange(-r_cap, r_cap + 1)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")  # [win, win]

    sigma = (2 * r + 1).astype(jnp.float32) / 6.0  # [G]
    val = jnp.exp(
        -(dx[None] ** 2 + dy[None] ** 2) / (2.0 * sigma[:, None, None] ** 2)
    )  # [G, win, win]
    inside = (jnp.abs(dx)[None] <= r[:, None, None]) & (
        jnp.abs(dy)[None] <= r[:, None, None]
    )

    px = centers_int[:, 0, None, None] + dx[None]
    py = centers_int[:, 1, None, None] + dy[None]
    ok = (
        inside
        & mask[:, None, None]
        & (px >= 0) & (px < w)
        & (py >= 0) & (py < h)
    )
    flat = (py * w + px) * c + cats[:, None, None]
    flat = jnp.where(ok, flat, h * w * c)
    hm = (
        jnp.zeros(h * w * c + 1, dtype=jnp.float32)
        .at[flat.reshape(-1)]
        .max(jnp.where(ok, val, 0.0).reshape(-1).astype(jnp.float32))
    )[: h * w * c]
    return hm.reshape(h, w, c)
