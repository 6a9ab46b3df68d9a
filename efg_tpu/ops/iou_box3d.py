"""Exact volumetric overlap / IoU of general (arbitrarily rotated) 3D boxes.

TPU-native replacement for the reference's pytorch3d-style plane-clip
operator (`/root/reference/efg/operators/iou_box3d.py` +
`efg/operators/src/iou_box3d/iou_box3d.cu`, `box3d_overlap`): each box is
the convex hull of 8 corners; the intersection boundary is assembled by
Sutherland–Hodgman-clipping every quad face of one box against the 6
half-spaces of the other (both directions), and the enclosed volume is
read off with the divergence theorem over the clipped, outward-oriented
polygon fans. Fixed vertex capacity (a quad clipped by 6 planes has ≤ 10
vertices), fully vmapped — no data-dependent shapes.

Unlike `ops.iou_rotated.iou_3d` (BEV-clip × z-slab, exact only for
yaw-only boxes), this handles boxes with any orientation.

Corner convention (pytorch3d / reference `_box_planes`):
    0 (x0,y0,z0)  1 (x1,y0,z0)  2 (x1,y1,z0)  3 (x0,y1,z0)
    4 (x0,y0,z1)  5 (x1,y0,z1)  6 (x1,y1,z1)  7 (x0,y1,z1)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# quad faces over the corner ordering above (reference `_box_planes`)
_BOX_QUADS = np.array(
    [[0, 1, 2, 3], [3, 2, 6, 7], [0, 1, 5, 4], [0, 3, 7, 4], [1, 2, 6, 5], [4, 5, 6, 7]]
)

# a quad clipped by 6 planes has ≤ 4 + 6 = 10 vertices
_CAP = 12

# half-space boundary tolerance. Faces of box A are kept when exactly ON a
# plane of B (d ≤ +eps) while faces of B are dropped there (d ≤ −eps), so a
# shared plane (e.g. identical boxes) contributes its boundary exactly once.
_EPS = 1e-4


def _oriented_quads(corners: jax.Array) -> jax.Array:
    """[8, 3] → [6, 4, 3] quad loops wound CCW as seen from outside."""
    center = corners.mean(axis=0)
    quads = corners[_BOX_QUADS]  # [6, 4, 3]
    n = jnp.cross(quads[:, 1] - quads[:, 0], quads[:, 2] - quads[:, 0])
    outward = jnp.sum(n * (quads.mean(axis=1) - center), axis=-1) >= 0
    return jnp.where(outward[:, None, None], quads, quads[:, ::-1])


def _planes(quads: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Outward unit normals + offsets from outward-wound quads.

    Inside test: n·x − off ≤ 0."""
    n = jnp.cross(quads[:, 1] - quads[:, 0], quads[:, 2] - quads[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    off = jnp.sum(n * quads[:, 0], axis=-1)
    return n, off


def _clip_by_plane(verts, count, n, off, eps):
    """Clip polygon (verts [CAP, 3], count) to the half-space n·x − off ≤ eps.

    Same interleaved-cumsum compaction as the 2D `iou_rotated` clipper;
    winding is preserved, so outward orientation survives."""
    idx = jnp.arange(_CAP)
    active = idx < count
    cur = verts
    nxt = verts[(idx + 1) % jnp.maximum(count, 1)]
    d_cur = cur @ n - off
    d_nxt = nxt @ n - off
    in_cur = d_cur <= eps
    in_nxt = d_nxt <= eps

    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[:, None] * (nxt - cur)

    emit_cur = in_cur & active
    emit_int = (in_cur ^ in_nxt) & active

    flags = jnp.stack([emit_cur, emit_int], axis=1).reshape(-1)  # [2·CAP]
    pts = jnp.stack([cur, inter], axis=1).reshape(-1, 3)
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    out_count = jnp.where(flags.any(), pos[-1] + 1, 0)
    write = jnp.where(flags & (pos < _CAP), pos, _CAP)
    out = jnp.zeros((_CAP + 1, 3), dtype=verts.dtype).at[write].set(pts)[:_CAP]
    return out, jnp.minimum(out_count, _CAP)


def _fan_volume(verts, count, ref):
    """Signed volume contribution of one outward-wound polygon: the fan of
    tetrahedra (ref, v0, vi, vi+1). Sums to the enclosed volume over a
    closed outward boundary (divergence theorem)."""
    i = jnp.arange(1, _CAP - 1)
    v0 = verts[0] - ref
    vi = verts[i] - ref
    vj = verts[i + 1] - ref
    tri = jnp.sum(v0 * jnp.cross(vi, vj), axis=-1)
    return jnp.sum(jnp.where(i + 1 < count, tri, 0.0)) / 6.0


def _hull_volume(corners: jax.Array) -> jax.Array:
    """Volume of one 8-corner hull (handles any parallelepiped)."""
    quads = _oriented_quads(corners)
    ref = corners.mean(axis=0)
    vols = jax.vmap(lambda q: _fan_volume(
        jnp.zeros((_CAP, 3), corners.dtype).at[:4].set(q), jnp.asarray(4, jnp.int32), ref
    ))(quads)
    return jnp.sum(vols)


def _pair_volume(ca: jax.Array, cb: jax.Array) -> jax.Array:
    """Intersection volume of two 8-corner hulls."""
    qa = _oriented_quads(ca)
    qb = _oriented_quads(cb)
    na, offa = _planes(qa)
    nb, offb = _planes(qb)
    ref = (ca.mean(axis=0) + cb.mean(axis=0)) / 2

    # 12 faces, each clipped by the OTHER box's 6 planes; A's faces keep
    # their boundary (+eps), B's drop it (−eps) — shared planes count once.
    faces = jnp.concatenate([qa, qb], axis=0)  # [12, 4, 3]
    clip_n = jnp.concatenate([jnp.broadcast_to(nb, (6, 6, 3)),
                              jnp.broadcast_to(na, (6, 6, 3))], axis=0)
    clip_off = jnp.concatenate([jnp.broadcast_to(offb, (6, 6)),
                                jnp.broadcast_to(offa, (6, 6))], axis=0)
    eps = jnp.concatenate([jnp.full((6,), _EPS), jnp.full((6,), -_EPS)])

    def face_vol(quad, ns, offs, e):
        verts = jnp.zeros((_CAP, 3), ca.dtype).at[:4].set(quad)
        count = jnp.asarray(4, jnp.int32)

        def body(p, state):
            v, c = state
            return _clip_by_plane(v, c, ns[p], offs[p], e)

        verts, count = jax.lax.fori_loop(0, 6, body, (verts, count))
        return _fan_volume(verts, count, ref)

    vols = jax.vmap(face_vol)(faces, clip_n, clip_off, eps)
    return jnp.maximum(jnp.sum(vols), 0.0)


def box3d_overlap(
    corners_a: jax.Array, corners_b: jax.Array, eps: float = 1e-7
) -> Tuple[jax.Array, jax.Array]:
    """Pairwise exact 3D overlap of general boxes (reference `box3d_overlap`).

    corners_a [N, 8, 3], corners_b [M, 8, 3] in the module corner
    convention → (volume [N, M], iou [N, M])."""
    vol = jax.vmap(
        jax.vmap(_pair_volume, in_axes=(None, 0)), in_axes=(0, None)
    )(corners_a, corners_b)
    va = jax.vmap(_hull_volume)(corners_a)
    vb = jax.vmap(_hull_volume)(corners_b)
    iou = vol / jnp.maximum(va[:, None] + vb[None, :] - vol, eps)
    return vol, iou


def corners_from_boxes(boxes: jax.Array) -> jax.Array:
    """[N, ≥7] center boxes `[x, y, z, dx, dy, dz, …, yaw]` (yaw CCW about
    +z, repo convention) → [N, 8, 3] corners in the module convention."""
    sx = jnp.array([-1, 1, 1, -1, -1, 1, 1, -1], boxes.dtype) * 0.5
    sy = jnp.array([-1, -1, 1, 1, -1, -1, 1, 1], boxes.dtype) * 0.5
    sz = jnp.array([-1, -1, -1, -1, 1, 1, 1, 1], boxes.dtype) * 0.5
    lx = sx * boxes[:, 3:4]
    ly = sy * boxes[:, 4:5]
    lz = sz * boxes[:, 5:6]
    yaw = boxes[:, -1:]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x = boxes[:, 0:1] + c * lx - s * ly
    y = boxes[:, 1:2] + s * lx + c * ly
    z = boxes[:, 2:3] + lz
    return jnp.stack([x, y, z], axis=-1)
