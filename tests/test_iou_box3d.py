"""Exact general 3D box overlap (`ops.iou_box3d`) vs analytic / Monte-Carlo
oracles and the yaw-only `ops.iou_rotated.iou_3d` path."""

import numpy as np
import jax.numpy as jnp

from efg_tpu.ops import iou_box3d as B
from efg_tpu.ops.iou_rotated import iou_3d


def _boxes7(rs, n, pos=3.0):
    b = np.zeros((n, 7), np.float32)
    b[:, :3] = rs.uniform(-pos, pos, (n, 3))
    b[:, 3:6] = rs.uniform(0.8, 3.0, (n, 3))
    b[:, 6] = rs.uniform(-np.pi, np.pi, n)
    return b


def _rot(rs):
    q = rs.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def _mc_volume(ca, cb, n_samples=400_000, seed=0):
    """Monte-Carlo intersection volume of two 8-corner hulls (numpy)."""

    def planes(c):
        quads = c[B._BOX_QUADS]
        n = np.cross(quads[:, 1] - quads[:, 0], quads[:, 2] - quads[:, 0])
        center = c.mean(0)
        flip = np.sum(n * (quads.mean(1) - center), -1) < 0
        n[flip] *= -1
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        return n, np.sum(n * quads[:, 0], -1)

    lo = np.minimum(ca.min(0), cb.min(0))
    hi = np.maximum(ca.max(0), cb.max(0))
    rs = np.random.RandomState(seed)
    pts = rs.uniform(lo, hi, (n_samples, 3)).astype(np.float32)
    inside = np.ones(n_samples, bool)
    for c in (ca, cb):
        n, off = planes(c)
        inside &= (pts @ n.T - off <= 1e-6).all(-1)
    return float(inside.mean() * np.prod(hi - lo))


def test_axis_aligned_known_overlap():
    a = np.array([[0.0, 0, 0, 1, 1, 1, 0]], np.float32)
    b = np.array([[0.5, 0.5, 0.5, 1, 1, 1, 0]], np.float32)
    vol, iou = B.box3d_overlap(B.corners_from_boxes(jnp.asarray(a)),
                               B.corners_from_boxes(jnp.asarray(b)))
    np.testing.assert_allclose(float(vol[0, 0]), 0.125, atol=1e-5)
    np.testing.assert_allclose(float(iou[0, 0]), 0.125 / (2 - 0.125), atol=1e-5)


def test_identical_disjoint_contained():
    a = np.array(
        [
            [0.0, 0, 0, 2, 1, 1, 0.3],  # vs itself -> iou 1
            [0.0, 0, 0, 1, 1, 1, 0.0],  # vs far box -> 0
            [0.0, 0, 0, 4, 4, 4, 0.0],  # contains the small box
        ],
        np.float32,
    )
    b = np.array(
        [
            [0.0, 0, 0, 2, 1, 1, 0.3],
            [10.0, 0, 0, 1, 1, 1, 0.7],
            [0.2, 0.1, 0.0, 1, 1, 1, 1.1],
        ],
        np.float32,
    )
    vol, iou = B.box3d_overlap(B.corners_from_boxes(jnp.asarray(a)),
                               B.corners_from_boxes(jnp.asarray(b)))
    np.testing.assert_allclose(float(iou[0, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(float(vol[1, 1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(vol[2, 2]), 1.0, atol=1e-3)  # inner volume
    np.testing.assert_allclose(float(iou[2, 2]), 1.0 / 64.0, atol=1e-4)


def test_matches_yaw_only_iou3d():
    rs = np.random.RandomState(3)
    a, b = _boxes7(rs, 6), _boxes7(rs, 5)
    _, iou = B.box3d_overlap(B.corners_from_boxes(jnp.asarray(a)),
                             B.corners_from_boxes(jnp.asarray(b)))
    ref = iou_3d(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(iou), np.asarray(ref), atol=2e-3)


def test_rotation_invariance_general():
    """vol(R·A, R·B) == vol(A, B) for a shared arbitrary rotation — the
    yaw-only oracle above + invariance pins the general-orientation path."""
    rs = np.random.RandomState(7)
    a, b = _boxes7(rs, 4, pos=1.5), _boxes7(rs, 4, pos=1.5)
    ca = np.asarray(B.corners_from_boxes(jnp.asarray(a)))
    cb = np.asarray(B.corners_from_boxes(jnp.asarray(b)))
    vol0, iou0 = B.box3d_overlap(jnp.asarray(ca), jnp.asarray(cb))
    R = _rot(rs)
    vol1, iou1 = B.box3d_overlap(jnp.asarray(ca @ R.T), jnp.asarray(cb @ R.T))
    np.testing.assert_allclose(np.asarray(vol1), np.asarray(vol0), atol=5e-3)
    np.testing.assert_allclose(np.asarray(iou1), np.asarray(iou0), atol=2e-3)


def test_monte_carlo_general_rotation():
    rs = np.random.RandomState(11)
    for seed in range(3):
        a = _boxes7(rs, 1, pos=0.5)[0]
        b = _boxes7(rs, 1, pos=0.5)[0]
        ca = np.asarray(B.corners_from_boxes(jnp.asarray(a[None])))[0] @ _rot(rs).T
        cb = np.asarray(B.corners_from_boxes(jnp.asarray(b[None])))[0] @ _rot(rs).T
        vol, _ = B.box3d_overlap(jnp.asarray(ca[None]), jnp.asarray(cb[None]))
        mc = _mc_volume(ca, cb, seed=seed)
        assert abs(float(vol[0, 0]) - mc) < max(0.03 * mc, 0.02), (float(vol[0, 0]), mc)
