import numpy as np

from efg_tpu.evaluator.tracking_evaluator import MOTAccumulator


def test_perfect_tracking_mota_1():
    acc = MOTAccumulator()
    for f in range(5):
        ct = np.array([[f * 1.0, 0.0], [0.0, f * 1.0]])
        acc.add_frame(ct, np.array([10, 11]), ct, np.array([1, 2]))
    r = acc.summarize()
    assert r["MOTA"] == 1.0 and r["IDSW"] == 0 and r["MOTP"] == 0.0


def test_id_switch_detected():
    acc = MOTAccumulator()
    gt = np.array([[0.0, 0.0]])
    acc.add_frame(gt, np.array([10]), gt, np.array([1]))
    acc.add_frame(gt, np.array([99]), gt, np.array([1]))  # new track id → IDSW
    r = acc.summarize()
    assert r["IDSW"] == 1
    assert r["MOTA"] == 1.0 - 1 / 2


def test_fp_fn_counting():
    acc = MOTAccumulator()
    acc.add_frame(np.array([[50.0, 50.0]]), np.array([7]), np.array([[0.0, 0.0]]), np.array([1]))
    r = acc.summarize()
    assert r["FP"] == 1 and r["FN"] == 1 and r["MOTA"] == -1.0


def test_seq_sampler_groups_sequences():
    from efg_tpu.data.samplers.dataset_sampler import SeqInferenceSampler

    seq_ids = ["a", "a", "b", "b", "b", "c"]
    s = SeqInferenceSampler(6, seq_ids)
    order = list(s)
    # frames of a sequence stay contiguous and ordered
    pos = {i: k for k, i in enumerate(order)}
    assert pos[0] < pos[1]
    assert pos[2] < pos[3] < pos[4]


# ---------------------------------------------------------------------------
# official-protocol tracking metric (Hungarian IoU matching, score sweep)
# ---------------------------------------------------------------------------

def _wm():
    from efg_tpu.evaluator.waymo_tracking import WaymoTrackingMetric

    return WaymoTrackingMetric(
        ["VEHICLE", "PEDESTRIAN"], {"VEHICLE": 0.7, "PEDESTRIAN": 0.5}
    )


def _box(x, y, yaw=0.0, l=4.0, w=2.0):
    return [x, y, 0.0, l, w, 1.8, yaw]


def test_official_perfect_tracking():
    wm = _wm()
    for f in range(5):
        boxes = np.array([_box(f * 1.0, 0.0), _box(0.0, f * 1.0 + 10)])
        wm.add_frame(
            "s0", boxes, np.array([0.9, 0.8]), np.array([1, 1]),
            np.array([10, 11]), boxes, np.array([1, 1]), np.array([1, 2]),
            np.array([1, 1]),
        )
    r = wm.compute()["VEHICLE_L2"]
    assert r["MOTA"] == 1.0 and r["mismatch"] == 0.0 and r["MOTP"] < 1e-6


def test_official_id_switch_is_mismatch():
    wm = _wm()
    gt = np.array([_box(0.0, 0.0)])
    wm.add_frame("s0", gt, np.array([0.9]), np.array([1]), np.array([10]),
                 gt, np.array([1]), np.array([1]), np.array([1]))
    wm.add_frame("s0", gt, np.array([0.9]), np.array([1]), np.array([99]),
                 gt, np.array([1]), np.array([1]), np.array([1]))
    r = wm.compute()["VEHICLE_L2"]
    assert abs(r["mismatch"] - 0.5) < 1e-9
    assert abs(r["MOTA"] - 0.5) < 1e-9


def test_official_cutoff_sweep_drops_low_score_fps():
    wm = _wm()
    gt = np.array([_box(0.0, 0.0)])
    # TP at 0.9 plus a far-away FP at score 0.2 → best cutoff excludes it
    dets = np.array([_box(0.0, 0.0), _box(100.0, 100.0)])
    for _ in range(4):
        wm.add_frame("s0", dets, np.array([0.9, 0.2]), np.array([1, 1]),
                     np.array([1, 2]), gt, np.array([1]), np.array([1]),
                     np.array([1]))
    r = wm.compute()["VEHICLE_L2"]
    assert r["MOTA"] == 1.0
    assert r["score_cutoff"] > 0.2


def test_official_l1_ignores_difficulty2():
    wm = _wm()
    gt = np.array([_box(0.0, 0.0), _box(20.0, 0.0)])
    dets = gt.copy()
    wm.add_frame("s0", dets, np.array([0.9, 0.9]), np.array([1, 1]),
                 np.array([1, 2]), gt, np.array([1, 1]), np.array([1, 2]),
                 np.array([1, 2]))  # second GT difficulty 2
    res = wm.compute()
    l1, l2 = res["VEHICLE_L1"], res["VEHICLE_L2"]
    assert l1["n_gt"] == 1 and l2["n_gt"] == 2
    # the difficulty-2 prediction is ignored at L1, not an FP
    assert l1["MOTA"] == 1.0 and l2["MOTA"] == 1.0


def test_official_iou_matching_not_center_distance():
    wm = _wm()
    gt = np.array([_box(0.0, 0.0)])
    # 1.5 m offset: within 2 m center distance but IoU < 0.7 → a miss + FP
    dets = np.array([_box(1.5, 0.0)])
    wm.add_frame("s0", dets, np.array([0.9]), np.array([1]), np.array([1]),
                 gt, np.array([1]), np.array([1]), np.array([1]))
    r = wm.compute()["VEHICLE_L2"]
    assert r["MOTA"] <= 0.0  # cutoff sweep may drop the FP but miss remains
    assert r["miss"] == 1.0
