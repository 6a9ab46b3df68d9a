"""Native C++ host kernels vs the numpy implementations."""

import numpy as np
import pytest

from efg_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (python setup_native.py)"
)


def test_native_voxelizer_parity():
    from efg_tpu.ops import voxelize_np

    rs = np.random.RandomState(3)
    pts = rs.uniform(-5, 5, (3000, 5)).astype(np.float32)
    vs, rng = (0.5, 0.5, 0.5), (-4, -4, -1, 4, 4, 3)
    v1, c1, n1 = native.points_to_voxel(pts, vs, rng, 4, 2048)
    v2, c2, n2 = voxelize_np.points_to_voxel(pts, vs, rng, 4, 2048)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_allclose(v1, v2)


def test_native_points_in_rbbox_parity():
    from efg_tpu.geometry import box_ops_np as G

    rs = np.random.RandomState(4)
    pts = rs.uniform(-8, 8, (500, 4)).astype(np.float32)
    boxes = np.column_stack(
        [rs.uniform(-5, 5, (12, 3)), rs.uniform(1, 4, (12, 3)),
         rs.uniform(-np.pi, np.pi, 12)]
    ).astype(np.float32)
    np.testing.assert_array_equal(
        native.points_in_rbbox(pts, boxes), G.points_in_rbbox(pts, boxes)
    )
