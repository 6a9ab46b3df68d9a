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


def test_native_box_collision_parity():
    from efg_tpu.geometry import box_ops_np as G

    rs = np.random.RandomState(5)
    boxes = np.column_stack(
        [rs.uniform(-10, 10, (40, 2)), rs.uniform(-1, 1, 40),
         rs.uniform(0.8, 5, (40, 3)), rs.uniform(-np.pi, np.pi, 40)]
    ).astype(np.float32)
    corners = G.boxes_to_corners_bev(boxes).astype(np.float32)
    want = G.box_collision_test(corners, corners)
    got = native.box_collision_test(corners, corners)
    np.testing.assert_array_equal(got, want)
    assert want.any() and not want.all()  # the fuzz actually exercises both


def test_native_tfrecord_scan_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from cli.data_preparation.waymo import tfrecord_decoder as TD

    rs = np.random.RandomState(6)
    payloads = [rs.bytes(rs.randint(1, 4000)) for _ in range(17)] + [b""]
    p = str(tmp_path / "fixture.tfrecord")
    TD.write_tfrecord(p, payloads)

    offs, lens = native.tfrecord_scan(p, verify_payload_crc=True)
    assert len(offs) == len(payloads)
    assert [int(x) for x in lens] == [len(b) for b in payloads]
    # decoder routes through the native scanner when available
    assert list(TD.read_tfrecord(p)) == payloads

    # corrupt one payload byte: the verified scan must reject record 3
    raw = bytearray(open(p, "rb").read())
    raw[int(offs[3])] ^= 0xFF
    bad = str(tmp_path / "bad.tfrecord")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(IOError, match="record 3"):
        native.tfrecord_scan(bad, verify_payload_crc=True)
    # unverified framing scan still walks the file
    offs2, _ = native.tfrecord_scan(bad, verify_payload_crc=False)
    assert len(offs2) == len(payloads)
