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


def test_segm_perfect_masks_ap1():
    ev = COCOEvalNP(iou_type="segm")
    h, w = 40, 40
    m1 = np.zeros((h, w), np.uint8); m1[5:20, 5:20] = 1
    m2 = np.zeros((h, w), np.uint8); m2[25:38, 10:30] = 1
    gt_boxes = np.array([[5, 5, 20, 20.0], [10, 25, 30, 38.0]])
    ev.add_image(
        0, gt_boxes, np.array([0.9, 0.8]), gt_boxes,
        np.zeros(2, bool), np.zeros(0),
        det_masks=np.stack([m1, m2]), gt_masks=np.stack([m1, m2]),
    )
    res = ev.summarize()
    assert res["AP"] > 0.99
    assert res["AR100"] > 0.99


def test_segm_shifted_mask_matches_at_low_iou_only():
    ev = COCOEvalNP(iou_type="segm")
    h, w = 40, 60
    gtm = np.zeros((h, w), np.uint8); gtm[10:30, 10:30] = 1
    dtm = np.zeros((h, w), np.uint8); dtm[10:30, 16:36] = 1  # IoU = 14/26 ≈ .538
    box = np.array([[10, 10, 30, 30.0]])
    ev.add_image(
        0, box, np.array([0.9]), box, np.zeros(1, bool), np.zeros(0),
        det_masks=dtm[None], gt_masks=gtm[None],
    )
    res = ev.summarize()
    # matched at IoU .5 only → AP ≈ 1/10
    assert 0.05 < res["AP"] < 0.15
    assert res["AP50"] > 0.99
    assert res["AP75"] < 0.01


def test_segm_box_disagreement_is_irrelevant():
    """segm matching must use mask IoU, not box IoU."""
    ev = COCOEvalNP(iou_type="segm")
    h, w = 40, 40
    m = np.zeros((h, w), np.uint8); m[5:20, 5:20] = 1
    det_box = np.array([[100, 100, 120, 120.0]])  # nonsense box
    gt_box = np.array([[5, 5, 20, 20.0]])
    ev.add_image(
        0, det_box, np.array([0.9]), gt_box, np.zeros(1, bool), np.zeros(0),
        det_masks=m[None], gt_masks=m[None],
    )
    assert ev.summarize()["AP"] > 0.99


def test_proposal_ar_class_agnostic():
    ev = COCOEvalNP()
    gt = np.array([[0, 0, 50, 50.0], [100, 100, 160, 160.0]])
    # proposals hit only the first GT
    ev.add_image(0, gt[:1], np.array([0.7]), gt, np.zeros(2, bool), np.zeros(0))
    res = ev.summarize_proposals(max_dets=(100,))
    assert abs(res["AR@100"] - 0.5) < 1e-6


def test_ar_small_dets_counts():
    ev = COCOEvalNP()
    gt = np.array([[0, 0, 50, 50.0], [60, 60, 110, 110.0]])
    dets = np.array([[0, 0, 50, 50.0]])
    ev.add_image(0, dets, np.array([0.9]), gt, np.zeros(2, bool), np.zeros(0))
    res = ev.summarize()
    assert abs(res["AR100"] - 0.5) < 1e-6
    assert abs(res["AR1"] - 0.5) < 1e-6


# ---------------------------------------------------------------------------
# keypoints (OKS) task — reference coco_evaluator.py:267 summary keys
# ---------------------------------------------------------------------------


def _person(x0, y0, s=60.0, k=17):
    """A GT person: box [x0,y0,x0+s,y0+s], keypoints on a grid, all labeled."""
    kp = np.zeros((k, 3))
    for i in range(k):
        kp[i] = [x0 + (i % 4) * s / 4 + 5, y0 + (i // 4) * s / 4 + 5, 2]
    return np.array([[x0, y0, x0 + s, y0 + s]]), kp[None], np.array([s * s])


def test_oks_exact_keypoints_is_one():
    from efg_tpu.evaluator.coco_eval_np import oks_np

    box, kp, area = _person(0, 0)
    oks = oks_np(kp, kp, box, area)
    assert abs(oks[0, 0] - 1.0) < 1e-9


def test_oks_falls_off_with_distance():
    from efg_tpu.evaluator.coco_eval_np import oks_np

    box, kp, area = _person(0, 0)
    far = kp.copy()
    far[..., :2] += 25.0
    oks = oks_np(np.concatenate([kp, far]), kp, box, area)
    assert oks[0, 0] > 0.99 and oks[1, 0] < 0.5


def test_oks_unlabeled_gt_uses_expanded_box():
    from efg_tpu.evaluator.coco_eval_np import oks_np

    box, kp, area = _person(0, 0)
    unl = kp.copy()
    unl[..., 2] = 0  # no labeled keypoints
    inside = kp  # det keypoints inside the expanded box -> zero distance
    oks = oks_np(inside, unl, box, area)
    assert abs(oks[0, 0] - 1.0) < 1e-9


def test_keypoints_perfect_detector_ap1():
    ev = COCOEvalNP(iou_type="keypoints")
    assert ev.max_dets == 20
    box, kp, area = _person(10, 10, s=120.0)  # area > 96^2 -> "large"
    ev.add_image(1, box, np.array([0.9]), box, np.zeros(1, bool), area,
                 det_keypoints=kp, gt_keypoints=kp)
    res = ev.summarize()
    assert abs(res["AP"] - 1.0) < 1e-6
    assert "APs" not in res  # keypoint protocol has no small range
    assert abs(res["APl"] - 1.0) < 1e-6


def test_keypoints_jittered_matches_some_thresholds_only():
    ev = COCOEvalNP(iou_type="keypoints")
    box, kp, area = _person(0, 0)
    noisy = kp.copy()
    noisy[..., :2] += 4.0  # moderate error vs s=60 person (OKS ~ 0.67)
    ev.add_image(1, box, np.array([0.9]), box, np.zeros(1, bool), area,
                 det_keypoints=noisy, gt_keypoints=kp)
    res = ev.summarize()
    assert res["AP50"] > 0.99  # loose threshold matches
    assert res["AP"] < 0.99    # strict thresholds drop


def test_keypoints_zero_labeled_gt_is_ignored():
    ev = COCOEvalNP(iou_type="keypoints")
    box, kp, area = _person(0, 0)
    unl = kp.copy()
    unl[..., 2] = 0
    # only GT has no labeled keypoints -> ignored; a matching det is
    # neither TP nor FP, so the category contributes no GT (nan -> skipped)
    ev.add_image(1, box, np.array([0.9]), box, np.zeros(1, bool), area,
                 det_keypoints=kp, gt_keypoints=unl)
    import math
    assert math.isnan(ev.summarize()["AP"])
