import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.geometry import box_ops_np as G
from efg_tpu.ops import iou_rotated as R
from efg_tpu.ops import nms as N


def _mc_intersection(box_a, box_b, n=200_000, seed=0):
    """Monte-Carlo oracle for BEV intersection area."""
    rs = np.random.RandomState(seed)
    ca = G.boxes_to_corners_bev(box_a[None])[0]
    cb = G.boxes_to_corners_bev(box_b[None])[0]
    lo = np.minimum(ca.min(0), cb.min(0))
    hi = np.maximum(ca.max(0), cb.max(0))
    pts = rs.uniform(lo, hi, (n, 2))
    pts3 = np.concatenate([pts, np.zeros((n, 1))], axis=1)
    big_a = np.concatenate([box_a[:2], [0], box_a[3:5], [10], [box_a[-1]]])
    big_b = np.concatenate([box_b[:2], [0], box_b[3:5], [10], [box_b[-1]]])
    in_a = G.points_in_rbbox(pts3, big_a[None])[:, 0]
    in_b = G.points_in_rbbox(pts3, big_b[None])[:, 0]
    area = np.prod(hi - lo)
    return (in_a & in_b).mean() * area


def test_iou_identical_and_disjoint():
    boxes = jnp.array([[0, 0, 0, 4.0, 2.0, 1.5, 0.3], [20, 0, 0, 4.0, 2.0, 1.5, 1.0]])
    iou = np.asarray(R.iou_bev(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
    assert iou[0, 1] == 0.0


def test_iou_axis_aligned_analytic():
    a = jnp.array([[0, 0, 0, 4.0, 4.0, 2.0, 0.0]])
    b = jnp.array([[2.0, 2.0, 0, 4.0, 4.0, 2.0, 0.0]])
    # intersection 2x2=4, union 16+16-4=28
    np.testing.assert_allclose(np.asarray(R.iou_bev(a, b))[0, 0], 4 / 28, atol=1e-5)


def test_iou_rotation_invariance():
    rs = np.random.RandomState(0)
    base = np.array([[0, 0, 0, 4.0, 2.0, 2.0, 0.0], [1.0, 0.5, 0, 3.0, 3.0, 2.0, 0.0]], np.float32)
    iou0 = np.asarray(R.iou_bev(jnp.asarray(base[:1]), jnp.asarray(base[1:])))[0, 0]
    for theta in rs.uniform(-np.pi, np.pi, 5):
        rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
        moved = base.copy()
        moved[:, :2] = base[:, :2] @ rot.T
        moved[:, -1] = base[:, -1] + theta
        got = np.asarray(R.iou_bev(jnp.asarray(moved[:1]), jnp.asarray(moved[1:])))[0, 0]
        np.testing.assert_allclose(got, iou0, atol=1e-4)


def test_iou_monte_carlo_random_pairs():
    rs = np.random.RandomState(3)
    for t in range(6):
        a = np.array([0, 0, 0, rs.uniform(2, 5), rs.uniform(1, 3), 2.0, rs.uniform(-np.pi, np.pi)], np.float32)
        b = np.array(
            [rs.uniform(-2, 2), rs.uniform(-2, 2), 0, rs.uniform(2, 5), rs.uniform(1, 3), 2.0,
             rs.uniform(-np.pi, np.pi)], np.float32)
        inter = float(np.asarray(R.intersection_area_bev(jnp.asarray(a[None]), jnp.asarray(b[None])))[0, 0])
        mc = _mc_intersection(a, b, seed=t)
        assert abs(inter - mc) < 0.05 * max(1.0, mc), (t, inter, mc)


def test_iou3d_z_overlap():
    a = jnp.array([[0, 0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0, 0, 1.0, 2.0, 2.0, 2.0, 0.0]])  # half z overlap
    # inter = 4*1, union = 8+8-4
    np.testing.assert_allclose(np.asarray(R.iou_3d(a, b))[0, 0], 4 / 12, atol=1e-5)


def test_rotated_nms_greedy_chain():
    # three boxes in a suppression chain: a(0.9) overlaps b(0.8), b overlaps
    # c(0.7), a far from c → greedy keeps a and c
    boxes = jnp.array(
        [
            [0.0, 0, 0, 4.0, 4.0, 2.0, 0.0],
            [3.0, 0, 0, 4.0, 4.0, 2.0, 0.0],
            [6.0, 0, 0, 4.0, 4.0, 2.0, 0.0],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, valid = N.rotated_nms(boxes, scores, iou_threshold=0.1, pre_max=8, post_max=4)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_rotated_nms_invalid_rows_and_padding():
    boxes = jnp.zeros((16, 7)).at[:, 3:6].set(1.0)
    scores = jnp.full((16,), N.NEG_INF)
    scores = scores.at[3].set(0.5)
    idx, valid = N.rotated_nms(boxes, scores, iou_threshold=0.5, pre_max=16, post_max=8)
    assert np.asarray(valid).sum() == 1
    assert np.asarray(idx)[0] == 3


def test_circle_nms():
    centers = jnp.array([[0.0, 0.0], [0.5, 0.0], [5.0, 5.0]])
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, valid = N.circle_nms(centers, scores, min_radius=1.0, pre_max=4, post_max=4)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}
