import numpy as np

from efg_tpu.evaluator.panoptic_evaluator import pq_single_image, summarize_pq


def test_pq_perfect_match():
    gt = np.zeros((20, 20), np.int32)
    gt[:10] = 1
    gt[10:] = 2
    stats = {}
    pq_single_image(gt, {1: 0, 2: 1}, gt, {1: 0, 2: 1}, {}, stats)
    res = summarize_pq(stats)
    assert res["PQ"] == 1.0 and res["SQ"] == 1.0 and res["RQ"] == 1.0


def test_pq_partial_overlap_and_fp():
    gt = np.zeros((20, 20), np.int32)
    gt[:, :10] = 1           # class 0
    gt[:, 10:] = 2           # class 1 (labeled, NOT void)
    pred = np.zeros((20, 20), np.int32)
    pred[:, :8] = 1          # IoU 0.8 with gt segment 1 (class 0)
    pred[:, 12:] = 3         # class-0 pred on class-1 ground → real FP
    stats = {}
    pq_single_image(pred, {1: 0, 3: 0}, gt, {1: 0, 2: 1}, {}, stats)
    res = summarize_pq(stats)
    # class 0: TP (iou .8) + 1 FP → SQ .8, RQ 1/1.5; class 1: 1 FN → RQ 0
    assert abs(stats[0][0] - 0.8) < 1e-6 and stats[0][1] == 1 and stats[0][2] == 1
    assert stats[1][3] == 1
    pq_cls0 = 0.8 * (1 / 1.5)
    assert abs(res["PQ"] - (pq_cls0 + 0.0) / 2) < 1e-6


def test_pq_crowd_ignored():
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1  # crowd
    pred = np.zeros((10, 10), np.int32)
    pred[:5] = 7  # overlaps only the crowd → ignored, not FP
    stats = {}
    pq_single_image(pred, {7: 0}, gt, {1: 0}, {1: True}, stats)
    res = summarize_pq(stats)
    assert res["n_categories"] == 0 or res["PQ"] == 0.0
    # no FP recorded
    assert all(st[2] == 0 for st in stats.values())


def test_pq_missed_gt_is_fn():
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1
    pred = np.zeros((10, 10), np.int32)
    stats = {}
    pq_single_image(pred, {}, gt, {1: 3}, {}, stats)
    assert stats[3][3] == 1  # FN
    res = summarize_pq(stats)
    assert res["PQ"] == 0.0
