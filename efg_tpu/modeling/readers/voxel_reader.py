"""Point-cloud readers (VFEs): dynamic mean voxel features and dynamic
pillar features.

Rebuild of `efg/modeling/readers/voxel_reader.py` and `pillar_encoder.py`:
on TPU both hard-voxelize+mean and torch_scatter dynamic VFEs collapse into
the one sorted segment-mean voxelizer (`efg_tpu.ops.voxelize`), so
`DynamicMeanVFE` here is the canonical reader. `PillarFeatureNet` uses the
dynamic (cap-free points-per-pillar) formulation: decorate every point with
its pillar's mean/center offsets, run the MLP over points on the MXU, then
segment-max into pillars.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efg_tpu.modeling.common.norms import MaskedBatchNorm
from efg_tpu.ops import voxelize as V


def dynamic_mean_vfe(
    points: jax.Array,
    mask: jax.Array,
    *,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    max_voxels: int,
    num_input_features: int,
):
    """points [B, N, C], mask [B, N] → (features [B, V, F], coords_zyx
    [B, V, 3], valid [B, V]). Feature = mean of the first
    `num_input_features` point channels over the voxel
    (reference `VoxelMeanFeatureExtractor` / `DynamicMeanVFE`)."""

    def one(p, m):
        vox = V.voxelize(p, m, pc_range=pc_range, voxel_size=voxel_size, max_voxels=max_voxels)
        feats = V.voxel_mean(p[:, :num_input_features], vox.point_slot, vox.counts, max_voxels)
        return feats, vox.coords, vox.valid

    return jax.vmap(one)(points, mask)


class PillarFeatureNet(nn.Module):
    """Dynamic PointPillars encoder (reference `PillarFeatureNet` + `PFNLayer`,
    `efg/modeling/readers/pillar_encoder.py:11-134`)."""

    num_filters: Sequence[int] = (64,)
    num_input_features: int = 5
    pc_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    voxel_size: Tuple[float, ...] = (0.2, 0.2, 6.0)
    max_pillars: int = 30000

    @nn.compact
    def __call__(self, points, mask, train: bool):
        """points [B, N, C], mask [B, N] → (pillar_feats [B, P, F],
        coords_yx [B, P, 2], valid [B, P])."""
        vs = self.voxel_size
        pr = self.pc_range

        def voxelize_one(p, m):
            return V.voxelize(
                p, m, pc_range=pr, voxel_size=vs, max_voxels=self.max_pillars
            )

        vox = jax.vmap(voxelize_one)(points, mask)

        def means_one(p, slot, counts):
            return V.voxel_mean(p[:, :3], slot, counts, self.max_pillars)

        pillar_means = jax.vmap(means_one)(points, vox.point_slot, vox.counts)  # [B, P, 3]

        slot = vox.point_slot  # [B, N]
        ok = slot >= 0
        slot_c = jnp.where(ok, slot, 0)
        mean_per_point = jnp.take_along_axis(
            pillar_means, slot_c[..., None], axis=1
        )  # [B, N, 3]
        # pillar geometric center (x, y) from the coords
        cx = (vox.coords[..., 2].astype(points.dtype) + 0.5) * vs[0] + pr[0]
        cy = (vox.coords[..., 1].astype(points.dtype) + 0.5) * vs[1] + pr[1]
        centers = jnp.stack([cx, cy], axis=-1)  # [B, P, 2]
        center_per_point = jnp.take_along_axis(centers, slot_c[..., None], axis=1)  # [B, N, 2]

        feats = jnp.concatenate(
            [
                points[..., : self.num_input_features],
                points[..., :3] - mean_per_point,
                points[..., :2] - center_per_point,
            ],
            axis=-1,
        )
        feats = feats * ok[..., None].astype(feats.dtype)

        b, n, c = feats.shape
        flat = feats.reshape(b * n, c)
        flat_ok = ok.reshape(b * n)
        for i, nf in enumerate(self.num_filters):
            flat = nn.Dense(nf, use_bias=False, name=f"pfn{i}_dense")(flat)
            flat = MaskedBatchNorm(name=f"pfn{i}_bn")(flat, flat_ok, use_running_average=not train)
            flat = jax.nn.relu(flat)
        feats = flat.reshape(b, n, -1)

        def max_one(f, s):
            return V.voxel_max(f, s, self.max_pillars)

        pillar_feats = jax.vmap(max_one)(feats, slot)
        return pillar_feats, vox.coords[..., 1:], vox.valid


def pillar_scatter(
    pillar_feats: jax.Array, coords_yx: jax.Array, valid: jax.Array, *, ny: int, nx: int
) -> jax.Array:
    """Scatter pillars onto the dense BEV canvas [B, ny, nx, F]
    (reference `PointPillarsScatter`, `pillar_encoder.py:135-166`)."""
    b, p, f = pillar_feats.shape
    flat_idx = coords_yx[..., 0] * nx + coords_yx[..., 1]
    flat_idx = jnp.where(valid, flat_idx, ny * nx)

    def one(feats, idx):
        canvas = jnp.zeros((ny * nx + 1, f), dtype=feats.dtype)
        canvas = canvas.at[idx].set(feats)
        return canvas[: ny * nx].reshape(ny, nx, f)

    return jax.vmap(one)(pillar_feats * valid[..., None].astype(pillar_feats.dtype), flat_idx)
