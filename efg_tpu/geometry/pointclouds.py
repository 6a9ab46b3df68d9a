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
    """Host container over padded points [B, N, 3] + lengths [B].

    Carries optional per-point normals/features and exposes the reference's
    list/padded/packed view surface (`efg/structures/pointclouds.py`:
    points_list/padded/packed, the packed↔padded index maps,
    update_padded, offset/scale/subsample, extend/split, bounding boxes,
    inside_box) in fixed-shape form — the device side of the framework
    always consumes the padded view + mask."""

    def __init__(self, points: List[np.ndarray], normals=None, features=None):
        self._list = [np.asarray(p, np.float32).reshape(-1, 3) for p in points]
        n = max((len(p) for p in self._list), default=0)
        self._padded = np.zeros((len(self._list), n, 3), np.float32)
        self._lengths = np.zeros(len(self._list), np.int64)
        for i, p in enumerate(self._list):
            self._padded[i, : len(p)] = p
            self._lengths[i] = len(p)
        self._normals = self._pad_aux(normals, 3) if normals is not None else None
        self._features = (
            self._pad_aux(features, None) if features is not None else None
        )

    def _pad_aux(self, aux_list, dim):
        aux_list = [np.asarray(a, np.float32) for a in aux_list]
        assert len(aux_list) == len(self._list)
        d = aux_list[0].shape[-1] if aux_list else (dim or 0)
        out = np.zeros((len(self._list), self._padded.shape[1], d), np.float32)
        for i, (a, n) in enumerate(zip(aux_list, self._lengths)):
            assert len(a) == n, "aux length must match points"
            out[i, :n] = a.reshape(n, d)
        return out

    # ------------------------------------------------------------- views
    def __len__(self) -> int:
        return len(self._list)

    def points_list(self) -> List[np.ndarray]:
        return self._list

    def points_padded(self) -> np.ndarray:
        return self._padded

    def normals_padded(self) -> Optional[np.ndarray]:
        return self._normals

    def features_padded(self) -> Optional[np.ndarray]:
        return self._features

    def num_points_per_cloud(self) -> np.ndarray:
        return self._lengths

    def points_packed(self) -> np.ndarray:
        return np.concatenate(self._list, axis=0) if self._list else np.zeros((0, 3))

    def normals_packed(self) -> Optional[np.ndarray]:
        if self._normals is None:
            return None
        return self._normals[self.padded_mask()]

    def features_packed(self) -> Optional[np.ndarray]:
        if self._features is None:
            return None
        return self._features[self.padded_mask()]

    def padded_mask(self) -> np.ndarray:
        n = self._padded.shape[1]
        return np.arange(n)[None, :] < self._lengths[:, None]

    # --------------------------------------------- packed↔padded indices
    def packed_to_cloud_idx(self) -> np.ndarray:
        """[P] cloud index of each packed point."""
        return np.repeat(np.arange(len(self._list)), self._lengths)

    def cloud_to_packed_first_idx(self) -> np.ndarray:
        """[B] offset of each cloud's first point in the packed view."""
        return np.concatenate([[0], np.cumsum(self._lengths)[:-1]]).astype(np.int64)

    def padded_to_packed_idx(self) -> np.ndarray:
        """[P] flat index into padded.reshape(B·N, 3) per packed point."""
        n = self._padded.shape[1]
        return np.concatenate(
            [i * n + np.arange(l) for i, l in enumerate(self._lengths)]
        ).astype(np.int64) if len(self._list) else np.zeros(0, np.int64)

    # ------------------------------------------------------ constructors
    @classmethod
    def from_padded(cls, padded: np.ndarray, lengths: np.ndarray) -> "Pointclouds":
        return cls([np.asarray(padded)[i, :l] for i, l in enumerate(lengths)])

    def update_padded(self, new_padded: np.ndarray) -> "Pointclouds":
        """New Pointclouds with the same lengths but replaced coordinates
        (reference `update_padded`: aux features carry over)."""
        out = Pointclouds.from_padded(new_padded, self._lengths)
        out._normals = self._normals
        out._features = self._features
        return out

    # --------------------------------------------------------- transforms
    def offset(self, t) -> "Pointclouds":
        t = np.asarray(t, np.float32).reshape(-1, 3)
        t = np.broadcast_to(t, (len(self._list), 3))
        return self.update_padded(self._padded + t[:, None, :])

    def scale(self, s) -> "Pointclouds":
        s = np.broadcast_to(np.asarray(s, np.float32).reshape(-1), (len(self._list),))
        return self.update_padded(self._padded * s[:, None, None])

    def _aux_lists(self):
        """Per-cloud (normals, features) lists trimmed to valid lengths."""
        nrm = (
            [self._normals[i, :l] for i, l in enumerate(self._lengths)]
            if self._normals is not None
            else None
        )
        feat = (
            [self._features[i, :l] for i, l in enumerate(self._lengths)]
            if self._features is not None
            else None
        )
        return nrm, feat

    def subsample(self, max_points: int, seed: int = 0) -> "Pointclouds":
        """Random subset per cloud, at most max_points (reference behavior).
        Normals/features follow the same point selection."""
        rs = np.random.RandomState(seed)
        nrm, feat = self._aux_lists()
        pts, new_nrm, new_feat = [], [], []
        for i, p in enumerate(self._list):
            if len(p) <= max_points:
                sel = slice(None)
            else:
                sel = rs.choice(len(p), max_points, replace=False)
            pts.append(p[sel])
            if nrm is not None:
                new_nrm.append(nrm[i][sel])
            if feat is not None:
                new_feat.append(feat[i][sel])
        return Pointclouds(
            pts,
            normals=new_nrm if nrm is not None else None,
            features=new_feat if feat is not None else None,
        )

    def extend(self, n: int) -> "Pointclouds":
        """Each cloud repeated n times, grouped (reference `extend`);
        normals/features repeat with their cloud."""
        nrm, feat = self._aux_lists()
        return Pointclouds(
            [p for p in self._list for _ in range(n)],
            normals=[a for a in nrm for _ in range(n)] if nrm is not None else None,
            features=[a for a in feat for _ in range(n)] if feat is not None else None,
        )

    def split(self, sizes: List[int]) -> List["Pointclouds"]:
        nrm, feat = self._aux_lists()
        out, i = [], 0
        for s in sizes:
            out.append(
                Pointclouds(
                    self._list[i : i + s],
                    normals=nrm[i : i + s] if nrm is not None else None,
                    features=feat[i : i + s] if feat is not None else None,
                )
            )
            i += s
        assert i == len(self._list)
        return out

    # ------------------------------------------------------------ queries
    def get_bounding_boxes(self) -> np.ndarray:
        """[B, 3, 2] per-axis (min, max) over valid points."""
        out = np.zeros((len(self._list), 3, 2), np.float32)
        for i, p in enumerate(self._list):
            if len(p):
                out[i, :, 0] = p.min(0)
                out[i, :, 1] = p.max(0)
        return out

    def inside_box(self, box) -> np.ndarray:
        """box [2, 3] or [B, 2, 3] (min-corner, max-corner) → packed bool [P]."""
        box = np.asarray(box, np.float32)
        if box.ndim == 2:
            box = np.broadcast_to(box, (len(self._list),) + box.shape)
        out = []
        for i, p in enumerate(self._list):
            ok = ((p >= box[i, 0]) & (p <= box[i, 1])).all(-1)
            out.append(ok)
        return np.concatenate(out) if out else np.zeros(0, bool)


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
