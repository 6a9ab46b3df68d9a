"""On-device dynamic voxelization (jit-able, fixed shapes).

This is the TPU-native replacement for the reference's CPU numba hard
voxelizer (`efg/geometry/point_cloud_ops.py:5-107`) and GPU
voxelize/scatter CUDA kernels (`efg/operators/src/voxelize/*`): instead of
serial hashing with atomics, we sort point voxel-ids once and use
segment reductions — deterministic, fully batched, and XLA-fusable.

Design:
- points arrive padded `[N, C]` with a validity mask (fixed N per config)
- voxel ids are linearized `(z, y, x)`; invalid/out-of-range points get a
  sentinel id that sorts last
- one `lax.sort` produces contiguous voxel segments; `cumsum` of
  boundary flags assigns each point a voxel slot in `[0, max_voxels)`
- per-voxel features are segment means/maxes over ALL points in the voxel
  (the reference's `DynamicMeanVFE` semantics, `efg/modeling/readers/
  voxel_reader.py:22-97`, rather than the first-`max_points` subsample
  of the hard voxelizer)

Voxels come out ordered by linear id (z-major), deterministically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

_SENTINEL = jnp.iinfo(jnp.int32).max


class VoxelizedPoints(NamedTuple):
    """Fixed-shape voxelization result for ONE sample.

    point_slot: [N] int32 — voxel slot per point, -1 for dropped points
    coords:     [V, 3] int32 — (z, y, x) per voxel slot, 0 where invalid
    valid:      [V] bool — slot occupancy
    counts:     [V] int32 — points per voxel (0 where invalid)
    num_voxels: [] int32 — number of occupied slots
    """

    point_slot: jax.Array
    coords: jax.Array
    valid: jax.Array
    counts: jax.Array
    num_voxels: jax.Array


def grid_size(pc_range: Sequence[float], voxel_size: Sequence[float]) -> Tuple[int, int, int]:
    """Static (nx, ny, nz) grid shape."""
    return tuple(
        int(round((pc_range[i + 3] - pc_range[i]) / voxel_size[i])) for i in range(3)
    )


@functools.partial(jax.jit, static_argnames=("pc_range", "voxel_size", "max_voxels"))
def voxelize(
    points: jax.Array,
    mask: jax.Array,
    *,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    max_voxels: int,
) -> VoxelizedPoints:
    """Assign each valid point a voxel slot. `points` [N, C] (xyz first),
    `mask` [N] bool. Batched use: `jax.vmap` over the leading axis."""
    n = points.shape[0]
    nx, ny, nz = grid_size(pc_range, voxel_size)
    lo = jnp.asarray(pc_range[:3], dtype=points.dtype)
    vs = jnp.asarray(voxel_size, dtype=points.dtype)

    cf = jnp.floor((points[:, :3] - lo) / vs)
    in_grid = ((cf >= 0) & (cf < jnp.asarray([nx, ny, nz], dtype=cf.dtype))).all(axis=-1)
    valid_pt = mask & in_grid
    c = cf.astype(jnp.int32)
    # linear id, z-major to match the reference's reverse (z, y, x) coords
    lin = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    lin = jnp.where(valid_pt, lin, _SENTINEL)

    order = jnp.arange(n, dtype=jnp.int32)
    sorted_lin, sorted_order = jax.lax.sort_key_val(lin, order)

    first = jnp.concatenate(
        [sorted_lin[:1] != _SENTINEL, sorted_lin[1:] != sorted_lin[:-1]]
    )
    # never start a segment inside the sentinel run
    first = first & (sorted_lin != _SENTINEL)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    slot_sorted = jnp.where(
        (sorted_lin != _SENTINEL) & (seg >= 0) & (seg < max_voxels), seg, -1
    )
    point_slot = jnp.zeros(n, dtype=jnp.int32).at[sorted_order].set(slot_sorted)

    # voxel linear ids: first occurrence writes its segment slot
    write_slot = jnp.where(first & (seg < max_voxels), seg, max_voxels)
    vox_lin = (
        jnp.full(max_voxels + 1, _SENTINEL, dtype=jnp.int32)
        .at[write_slot]
        .min(sorted_lin)[:max_voxels]
    )
    valid = vox_lin != _SENTINEL
    lin_safe = jnp.where(valid, vox_lin, 0)
    zc = lin_safe // (nx * ny)
    yc = (lin_safe // nx) % ny
    xc = lin_safe % nx
    coords = jnp.stack([zc, yc, xc], axis=-1) * valid[:, None].astype(jnp.int32)

    counts = (
        jnp.zeros(max_voxels + 1, dtype=jnp.int32)
        .at[jnp.where(point_slot >= 0, point_slot, max_voxels)]
        .add(1)[:max_voxels]
    )
    num_voxels = valid.sum().astype(jnp.int32)
    return VoxelizedPoints(point_slot, coords, valid, counts, num_voxels)


def voxel_mean(
    features: jax.Array, point_slot: jax.Array, counts: jax.Array, max_voxels: int
) -> jax.Array:
    """Segment-mean point features into voxel slots. `features` [N, C],
    returns [V, C]. The TPU replacement for `VoxelMeanFeatureExtractor` +
    `DynamicScatter(mean)` (`efg/operators/scatter_points.py:8-86`)."""
    valid_pt = point_slot >= 0
    idx = jnp.where(valid_pt, point_slot, max_voxels)
    sums = (
        jnp.zeros((max_voxels + 1, features.shape[-1]), dtype=jnp.float32)
        .at[idx]
        .add(jnp.where(valid_pt[:, None], features, 0).astype(jnp.float32))
    )[:max_voxels]
    denom = jnp.maximum(counts, 1).astype(jnp.float32)[:, None]
    return (sums / denom).astype(features.dtype)


def voxel_max(
    features: jax.Array, point_slot: jax.Array, max_voxels: int, neg_inf: float = -1e9
) -> jax.Array:
    """Segment-max point features into voxel slots ([N, C] → [V, C]);
    empty voxels produce 0 (post-ReLU convention of pillar nets)."""
    valid_pt = point_slot >= 0
    idx = jnp.where(valid_pt, point_slot, max_voxels)
    maxed = (
        jnp.full((max_voxels + 1, features.shape[-1]), neg_inf, dtype=features.dtype)
        .at[idx]
        .max(jnp.where(valid_pt[:, None], features, neg_inf))
    )[:max_voxels]
    return jnp.where(maxed <= neg_inf / 2, 0.0, maxed)
