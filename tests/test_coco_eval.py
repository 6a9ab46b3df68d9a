import numpy as np

from efg_tpu.evaluator.coco_eval_np import COCOEvalNP, iou_xyxy_np


def test_iou_crowd_semantics():
    a = np.array([[0, 0, 10, 10.0]])
    b = np.array([[0, 0, 20, 20.0]])
    plain = iou_xyxy_np(a, b)[0, 0]
    crowd = iou_xyxy_np(a, b, iscrowd=np.array([True]))[0, 0]
    assert np.isclose(plain, 100 / 400)
    assert np.isclose(crowd, 1.0)  # intersection over det area


def test_perfect_detections_give_ap1():
    ev = COCOEvalNP()
    rs = np.random.RandomState(0)
    for img in range(5):
        gt = np.column_stack(
            [rs.uniform(0, 100, (4, 2)), rs.uniform(110, 200, (4, 2))]
        )
        ev.add_image(0, gt, np.ones(4) * 0.9, gt, np.zeros(4, bool), np.zeros(0))
    res = ev.summarize()
    assert res["AP"] > 0.99
    assert res["AP50"] > 0.99


def test_missed_half_gives_lower_ap():
    ev = COCOEvalNP()
    rs = np.random.RandomState(1)
    for img in range(5):
        gt = np.column_stack([rs.uniform(0, 50, (4, 2)), rs.uniform(60, 150, (4, 2))])
        ev.add_image(0, gt[:2], np.ones(2) * 0.9, gt, np.zeros(4, bool), np.zeros(0))
    res = ev.summarize()
    assert 0.4 < res["AP"] < 0.6


def test_false_positives_reduce_ap():
    ev = COCOEvalNP()
    gt = np.array([[0, 0, 50, 50.0]])
    # one TP at score .9 plus one higher-scored FP → precision penalty
    dets = np.array([[0, 0, 50, 50.0], [200, 200, 240, 240.0]])
    ev.add_image(0, dets, np.array([0.8, 0.95]), gt, np.zeros(1, bool), np.zeros(0))
    res = ev.summarize()
    assert 0.3 < res["AP"] < 0.7


def test_empty_category_is_nan_ignored():
    ev = COCOEvalNP()
    gt = np.array([[0, 0, 50, 50.0]])
    ev.add_image(0, gt, np.array([0.9]), gt, np.zeros(1, bool), np.zeros(0))
    ev.add_image(1, np.zeros((0, 4)), np.zeros(0), np.zeros((0, 4)), np.zeros(0, bool), np.zeros(0))
    res = ev.summarize()
    assert res["AP"] > 0.99  # cat 1 has no gt → NaN → excluded from mean
