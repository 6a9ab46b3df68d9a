import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.geometry.pointclouds import Pointclouds, estimate_pointcloud_normals, symeig3x3
from efg_tpu.modeling.losses import (
    giou_loss_2d,
    rotated_giou_3d_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
)


def test_pointclouds_views():
    pc = Pointclouds([np.zeros((5, 3)), np.ones((3, 3))])
    assert len(pc) == 2
    assert pc.points_padded().shape == (2, 5, 3)
    np.testing.assert_array_equal(pc.num_points_per_cloud(), [5, 3])
    assert pc.points_packed().shape == (8, 3)
    assert pc.padded_mask().sum() == 8


def test_symeig3x3_matches_numpy():
    rs = np.random.RandomState(0)
    a = rs.randn(16, 3, 3)
    a = (a + a.transpose(0, 2, 1)) / 2
    vals, vecs = symeig3x3(jnp.asarray(a.astype(np.float32)))
    exp_vals = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.asarray(vals), exp_vals, atol=1e-4)
    # eigen equation holds
    for i in range(3):
        lhs = np.einsum("bij,bj->bi", a, np.asarray(vecs[..., i]))
        rhs = np.asarray(vals[..., i : i + 1]) * np.asarray(vecs[..., i])
        np.testing.assert_allclose(lhs, rhs, atol=1e-3)


def test_normals_of_a_plane():
    rs = np.random.RandomState(1)
    pts = np.zeros((1, 256, 3), np.float32)
    pts[0, :, 0] = rs.uniform(-5, 5, 256)
    pts[0, :, 1] = rs.uniform(-5, 5, 256)
    pts[0, :, 2] = 0.01 * rs.randn(256)  # near-planar z≈0
    normals = estimate_pointcloud_normals(jnp.asarray(pts), k=8)
    nz = np.abs(np.asarray(normals)[0, :, 2])
    assert (nz > 0.95).mean() > 0.95  # normal ≈ ±z almost everywhere


def test_losses_basic():
    assert float(smooth_l1_loss(jnp.asarray(0.5), jnp.asarray(0.0), beta=1.0)) == pytest.approx(0.125)
    assert float(smooth_l1_loss(jnp.asarray(3.0), jnp.asarray(0.0), beta=1.0)) == pytest.approx(2.5)
    fl = sigmoid_focal_loss(jnp.asarray([10.0]), jnp.asarray([1.0]))
    assert float(fl[0]) < 1e-4  # confident correct → tiny loss
    same = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    assert float(giou_loss_2d(same, same)[0]) == pytest.approx(0.0, abs=1e-5)


def test_rotated_giou3d_loss():
    a = jnp.asarray([[0, 0, 0, 4.0, 2.0, 2.0, 0.3]])
    assert float(rotated_giou_3d_loss(a, a)[0]) == pytest.approx(0.0, abs=1e-4)
    b = jnp.asarray([[10, 0, 0, 4.0, 2.0, 2.0, 0.3]])
    assert float(rotated_giou_3d_loss(a, b)[0]) > 1.0  # disjoint → > 1
    # differentiable
    g = jax.grad(lambda x: rotated_giou_3d_loss(x, b).sum())(a)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_pointclouds_packed_view_api():
    rs = np.random.RandomState(0)
    pts = [rs.randn(5, 3).astype(np.float32), rs.randn(3, 3).astype(np.float32)]
    feats = [rs.randn(5, 4).astype(np.float32), rs.randn(3, 4).astype(np.float32)]
    pc = Pointclouds(pts, features=feats)

    assert pc.points_packed().shape == (8, 3)
    np.testing.assert_array_equal(pc.packed_to_cloud_idx(), [0]*5 + [1]*3)
    np.testing.assert_array_equal(pc.cloud_to_packed_first_idx(), [0, 5])
    # padded_to_packed round-trip
    flat = pc.points_padded().reshape(-1, 3)[pc.padded_to_packed_idx()]
    np.testing.assert_allclose(flat, pc.points_packed())
    np.testing.assert_allclose(pc.features_packed(), np.concatenate(feats))

    moved = pc.offset([1.0, 0.0, 0.0])
    np.testing.assert_allclose(moved.points_list()[1][:, 0], pts[1][:, 0] + 1.0)
    assert moved.features_padded() is not None  # aux carries over
    scaled = pc.scale(2.0)
    np.testing.assert_allclose(scaled.points_packed(), pc.points_packed() * 2)

    sub = pc.subsample(4)
    np.testing.assert_array_equal(sub.num_points_per_cloud(), [4, 3])
    ext = pc.extend(2)
    assert len(ext) == 4 and ext.num_points_per_cloud()[1] == 5
    parts = pc.split([1, 1])
    assert len(parts) == 2 and len(parts[1].points_list()[0]) == 3

    bb = pc.get_bounding_boxes()
    np.testing.assert_allclose(bb[0, :, 0], pts[0].min(0))
    inside = pc.inside_box(np.array([[-10, -10, -10], [10, 10, 10]], np.float32))
    assert inside.all() and inside.shape == (8,)
