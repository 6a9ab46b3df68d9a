"""Batched heterogeneous point clouds + normal estimation.

Rebuild of `efg/structures/pointclouds.py` (pytorch3d-style list/padded/
packed views) and `efg/geometry/point_normals.py` + `symeig3x3.py`: the
TPU-native form keeps ONE fixed-shape padded view `[B, N, 3]` + lengths
(packed/list views are host-side conveniences), and normals come from
KNN-neighborhood covariance with an analytic 3×3 symmetric
eigendecomposition (no iterative solver on device).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from efg_tpu.ops.knn import knn_gather, knn_points


class Pointclouds:
    """Host container over padded points [B, N, 3] + lengths [B]."""

    def __init__(self, points: List[np.ndarray]):
        self._list = [np.asarray(p, np.float32).reshape(-1, 3) for p in points]
        n = max((len(p) for p in self._list), default=0)
        self._padded = np.zeros((len(self._list), n, 3), np.float32)
        self._lengths = np.zeros(len(self._list), np.int64)
        for i, p in enumerate(self._list):
            self._padded[i, : len(p)] = p
            self._lengths[i] = len(p)

    def __len__(self) -> int:
        return len(self._list)

    def points_list(self) -> List[np.ndarray]:
        return self._list

    def points_padded(self) -> np.ndarray:
        return self._padded

    def num_points_per_cloud(self) -> np.ndarray:
        return self._lengths

    def points_packed(self) -> np.ndarray:
        return np.concatenate(self._list, axis=0) if self._list else np.zeros((0, 3))

    def padded_mask(self) -> np.ndarray:
        n = self._padded.shape[1]
        return np.arange(n)[None, :] < self._lengths[:, None]


def symeig3x3(a: jax.Array):
    """Analytic eigenvalues/vectors of symmetric 3×3 matrices [..., 3, 3]
    (reference `efg/geometry/symeig3x3.py:9+`, the Eberly closed form).
    Returns (eigvals ascending [..., 3], eigvecs [..., 3, 3] columns)."""
    q = jnp.trace(a, axis1=-2, axis2=-1)[..., None, None] / 3.0
    b = a - q * jnp.eye(3, dtype=a.dtype)
    p2 = (b**2).sum((-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-20))
    det_b = jnp.linalg.det(b)
    r = det_b / jnp.maximum(2 * p**3, 1e-20)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    q0 = q[..., 0, 0]
    e1 = q0 + 2 * p * jnp.cos(phi)
    e3 = q0 + 2 * p * jnp.cos(phi + 2 * jnp.pi / 3)
    e2 = 3 * q0 - e1 - e3
    vals = jnp.stack([e3, e2, e1], axis=-1)  # ascending

    def eigvec(mat, lam):
        m = mat - lam[..., None, None] * jnp.eye(3, dtype=mat.dtype)
        # cross products of row pairs: the nullspace direction
        c0 = jnp.cross(m[..., 0, :], m[..., 1, :])
        c1 = jnp.cross(m[..., 0, :], m[..., 2, :])
        c2 = jnp.cross(m[..., 1, :], m[..., 2, :])
        cands = jnp.stack([c0, c1, c2], axis=-2)
        norms = jnp.linalg.norm(cands, axis=-1)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    vecs = jnp.stack([eigvec(a, vals[..., i]) for i in range(3)], axis=-1)
    return vals, vecs


def estimate_pointcloud_normals(
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    k: int = 16,
) -> jax.Array:
    """Per-point normals [B, N, 3] from the smallest eigenvector of the
    local covariance (reference `point_normals.py:201-371`)."""
    _, idx = knn_points(points, points, query_mask=mask, points_mask=mask, k=k)
    nbrs = knn_gather(points, idx)  # [B, N, K, 3]
    mean = nbrs.mean(axis=-2, keepdims=True)
    d = nbrs - mean
    cov = jnp.einsum("bnki,bnkj->bnij", d, d) / k
    _, vecs = symeig3x3(cov)
    normals = vecs[..., 0]  # smallest eigenvalue direction
    if mask is not None:
        normals = normals * mask[..., None].astype(normals.dtype)
    return normals
