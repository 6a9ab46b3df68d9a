import numpy as np
import pytest

from efg_tpu.geometry import box_ops_np as G


def test_limit_period():
    assert np.isclose(G.limit_period(np.array([3.5 * np.pi]), 0.5, 2 * np.pi), -0.5 * np.pi)
    v = G.limit_period(np.random.RandomState(0).uniform(-10, 10, 100), 0.5, 2 * np.pi)
    assert (v >= -np.pi).all() and (v < np.pi).all()


def test_corners_axis_aligned():
    boxes = np.array([[1.0, 2.0, 0.5, 4.0, 2.0, 1.0, 0.0]])
    corners = G.boxes_to_corners_3d(boxes)
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners[0].min(axis=0), [-1.0, 1.0, 0.0])
    np.testing.assert_allclose(corners[0].max(axis=0), [3.0, 3.0, 1.0])


def test_corners_rotation_90deg():
    boxes = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.0, np.pi / 2]])
    corners = G.boxes_to_corners_bev(boxes)
    # after 90° CCW the long axis (dx=4) lies along y
    assert np.isclose(np.abs(corners[0][:, 0]).max(), 1.0, atol=1e-6)
    assert np.isclose(np.abs(corners[0][:, 1]).max(), 2.0, atol=1e-6)


def test_points_in_rbbox_rotated():
    # box 4x2 rotated 45°, point along the rotated long axis
    yaw = np.pi / 4
    boxes = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, yaw]])
    along = np.array([[1.9 * np.cos(yaw), 1.9 * np.sin(yaw), 0.0]])
    across = np.array([[1.9 * np.cos(yaw + np.pi / 2), 1.9 * np.sin(yaw + np.pi / 2), 0.0]])
    assert G.points_in_rbbox(along, boxes)[0, 0]
    assert not G.points_in_rbbox(across, boxes)[0, 0]
    # z outside
    high = np.array([[0.0, 0.0, 1.5]])
    assert not G.points_in_rbbox(high, boxes)[0, 0]


def test_points_in_rbbox_matches_bruteforce():
    rs = np.random.RandomState(1)
    boxes = np.column_stack(
        [
            rs.uniform(-5, 5, (20, 2)).reshape(20, 2),
            rs.uniform(-1, 1, 20),
            rs.uniform(1, 4, (20, 3)).reshape(20, 3),
            rs.uniform(-np.pi, np.pi, 20),
        ]
    )
    pts = rs.uniform(-8, 8, (500, 3))
    got = G.points_in_rbbox(pts, boxes)
    # brute force: rotate each point into each box frame
    for j in range(20):
        x, y, z, dx, dy, dz, yaw = boxes[j]
        d = pts - [x, y, z]
        lx = d[:, 0] * np.cos(yaw) + d[:, 1] * np.sin(yaw)
        ly = -d[:, 0] * np.sin(yaw) + d[:, 1] * np.cos(yaw)
        exp = (np.abs(lx) <= dx / 2) & (np.abs(ly) <= dy / 2) & (np.abs(d[:, 2]) <= dz / 2)
        np.testing.assert_array_equal(got[:, j], exp)


def test_box_collision():
    a = G.boxes_to_corners_bev(np.array([[0, 0, 0, 4.0, 2.0, 1.0, 0.0]]))
    overlapping = G.boxes_to_corners_bev(np.array([[1.0, 0.5, 0, 4.0, 2.0, 1.0, 0.3]]))
    separate = G.boxes_to_corners_bev(np.array([[10.0, 10.0, 0, 4.0, 2.0, 1.0, 0.0]]))
    contained = G.boxes_to_corners_bev(np.array([[0.0, 0.0, 0, 1.0, 0.5, 1.0, 0.7]]))
    cross_a = G.boxes_to_corners_bev(np.array([[0, 0, 0, 10.0, 1.0, 1.0, 0.0]]))
    cross_b = G.boxes_to_corners_bev(np.array([[0, 0, 0, 1.0, 10.0, 1.0, 0.0]]))

    assert G.box_collision_test(a, overlapping)[0, 0]
    assert not G.box_collision_test(a, separate)[0, 0]
    assert G.box_collision_test(a, contained)[0, 0]
    assert G.box_collision_test(contained, a)[0, 0]
    # plus-sign overlap: no corners inside, edges cross
    assert G.box_collision_test(cross_a, cross_b)[0, 0]


def test_range_masks():
    pts = np.array([[0, 0, 0], [100, 0, 0], [0, 0, 50]], dtype=np.float64)
    rng = [-75.2, -75.2, -2, 75.2, 75.2, 4]
    np.testing.assert_array_equal(G.mask_points_by_range(pts, rng), [True, False, False])
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0], [100, 0, 0, 2, 2, 2, 0.0]])
    np.testing.assert_array_equal(G.mask_boxes_outside_range_center(boxes, rng), [True, False])


def test_gaussian_radius_monotone():
    small = G.gaussian_radius((2.0, 2.0), 0.1)
    large = G.gaussian_radius((10.0, 10.0), 0.1)
    assert 0 < small < large


def test_jnp_twins_match_numpy():
    jnp_ops = pytest.importorskip("efg_tpu.geometry.box_ops_jnp")
    rs = np.random.RandomState(2)
    boxes = np.column_stack(
        [rs.uniform(-5, 5, (8, 3)), rs.uniform(1, 4, (8, 3)), rs.uniform(-np.pi, np.pi, 8)]
    ).astype(np.float32)
    pts = rs.uniform(-8, 8, (64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jnp_ops.boxes_to_corners_3d(boxes)), G.boxes_to_corners_3d(boxes), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(jnp_ops.points_in_rbbox(pts, boxes)), G.points_in_rbbox(pts, boxes)
    )
