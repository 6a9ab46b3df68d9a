import numpy as np
import pytest

from efg_tpu.data.structures import (
    BitMasks,
    Boxes,
    BoxMode,
    Instances,
    PolygonMasks,
    pairwise_iou,
)


def test_boxmode_conversions():
    xywh = np.array([[10, 20, 30, 40.0]])
    xyxy = BoxMode.convert(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(xyxy, [[10, 20, 40, 60]])
    back = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(back, xywh)
    rot = np.array([[50, 50, 20, 10, 90.0]])
    hull = BoxMode.convert(rot, BoxMode.XYWHA_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(hull, [[45, 40, 55, 60]], atol=1e-6)


def test_boxes_ops():
    b = Boxes(np.array([[0, 0, 10, 10], [5, 5, 8, 8], [-5, -5, 3, 3.0]]))
    np.testing.assert_allclose(b.area(), [100, 9, 64])
    b2 = b.clone()
    b2.clip((6, 6))
    assert b2.tensor.max() <= 6
    assert b.nonempty().all()
    iou = pairwise_iou(b[:1], b[1:2])
    np.testing.assert_allclose(iou, [[9 / 100]])


def test_instances_fields_and_cat():
    inst = Instances((100, 100), boxes=Boxes(np.zeros((3, 4))), scores=np.ones(3))
    assert len(inst) == 3
    sub = inst[np.array([True, False, True])]
    assert len(sub) == 2
    merged = Instances.cat([inst, sub])
    assert len(merged) == 5
    with pytest.raises(AssertionError):
        inst.set("bad", np.zeros(2))


def test_polygon_to_bitmask_and_area():
    # 10x10 square polygon
    poly = [np.array([2, 2, 8, 2, 8, 8, 2, 8], np.float64)]
    pm = PolygonMasks([poly])
    bm = pm.to_bitmasks(12, 12)
    assert bm.tensor.shape == (1, 12, 12)
    assert 36 <= bm.tensor.sum() <= 49  # raster of a 6x6 square
    np.testing.assert_allclose(pm.area(), [36.0])
    boxes = bm.get_bounding_boxes()
    np.testing.assert_allclose(boxes.tensor[0], [2, 2, 9, 9], atol=1)


def test_bitmask_crop_and_resize():
    m = np.zeros((1, 20, 20), bool)
    m[0, 5:15, 5:15] = True
    bm = BitMasks(m)
    crop = bm.crop_and_resize(np.array([[5, 5, 15, 15.0]]), 8)
    assert crop.shape == (1, 8, 8)
    assert crop.all()
