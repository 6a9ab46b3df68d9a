"""Waymo AP/APH and nuScenes metric core tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from efg_tpu.evaluator.det3d_metrics import DetectionAPCalculator, _heading_accuracy


def _boxes(rs, n, spread=30.0):
    return np.column_stack(
        [rs.uniform(-spread, spread, (n, 2)), rs.uniform(-1, 1, n),
         rs.uniform(3, 5, n), rs.uniform(1.5, 2.5, n), rs.uniform(1.2, 2.0, n),
         rs.uniform(-np.pi, np.pi, n)]
    ).astype(np.float32)


def test_heading_accuracy():
    assert _heading_accuracy(np.array(0.0), np.array(0.0)) == pytest.approx(1.0)
    assert _heading_accuracy(np.array(0.0), np.array(np.pi)) == pytest.approx(0.0)
    assert _heading_accuracy(np.array(0.0), np.array(np.pi / 2)) == pytest.approx(0.5)
    # wrap-around
    assert _heading_accuracy(np.array(-np.pi + 0.01), np.array(np.pi - 0.01)) > 0.99


def test_perfect_detections_ap1():
    calc = DetectionAPCalculator(["VEHICLE"], {"VEHICLE": 0.7})
    rs = np.random.RandomState(0)
    for f in range(4):
        gt = _boxes(rs, 5)
        calc.add_frame(gt, np.ones(5) * 0.9, np.ones(5, np.int64),
                       gt, np.ones(5, np.int64))
    res = calc.compute()
    assert res["VEHICLE/L2/AP"] == pytest.approx(1.0)
    assert res["VEHICLE/L2/APH"] == pytest.approx(1.0)


def test_heading_errors_reduce_aph_not_ap():
    calc = DetectionAPCalculator(["VEHICLE"], {"VEHICLE": 0.7})
    rs = np.random.RandomState(1)
    gt = _boxes(rs, 6)
    pred = gt.copy()
    pred[:, -1] += np.pi  # perfectly localized, 180° wrong heading
    calc.add_frame(pred, np.ones(6) * 0.9, np.ones(6, np.int64),
                   gt, np.ones(6, np.int64))
    res = calc.compute()
    assert res["VEHICLE/L2/AP"] == pytest.approx(1.0)
    assert res["VEHICLE/L2/APH"] == pytest.approx(0.0, abs=1e-6)


def test_l1_l2_difficulty_split():
    calc = DetectionAPCalculator(["VEHICLE"], {"VEHICLE": 0.7})
    rs = np.random.RandomState(2)
    gt = _boxes(rs, 4)
    difficulty = np.array([0, 0, 2, 2], np.int64)  # two L2-only GTs
    # detect only the L1 boxes
    calc.add_frame(gt[:2], np.ones(2) * 0.9, np.ones(2, np.int64),
                   gt, np.ones(4, np.int64), difficulty, np.full(4, 100))
    res = calc.compute()
    assert res["VEHICLE/L1/AP"] == pytest.approx(1.0)   # all L1 found
    assert res["VEHICLE/L2/AP"] == pytest.approx(0.5, abs=0.01)  # half of all


def test_false_positives_lower_ap():
    calc = DetectionAPCalculator(["VEHICLE"], {"VEHICLE": 0.7})
    rs = np.random.RandomState(3)
    gt = _boxes(rs, 3)
    fp = _boxes(rs, 3, spread=200.0)
    pred = np.concatenate([gt, fp])
    scores = np.array([0.9, 0.9, 0.9, 0.95, 0.95, 0.95])  # FPs score higher
    calc.add_frame(pred, scores, np.ones(6, np.int64), gt, np.ones(3, np.int64))
    res = calc.compute()
    assert res["VEHICLE/L2/AP"] < 0.6


def test_nuscenes_metric_core():
    from efg_tpu.evaluator.nuscenes_evaluator import _ClassAccumulator

    rs = np.random.RandomState(4)
    acc = _ClassAccumulator()
    gt = np.column_stack(
        [rs.uniform(-30, 30, (5, 2)), rs.uniform(-1, 1, 5), rs.uniform(3, 5, (5, 3)),
         rs.randn(5, 2), rs.uniform(-np.pi, np.pi, 5)]
    )
    det = gt.copy()
    det[:, :2] += 0.3  # within the 0.5m threshold
    acc.frames.append(dict(det=det, scores=np.ones(5) * 0.9, gt=gt))
    r = acc.ap_and_tp()
    assert r["AP@0.5"] > 0.95
    assert r["AP@4.0"] > 0.95
    assert r["TRANS"] == pytest.approx(np.sqrt(2) * 0.3, rel=0.05)
    assert r["SCALE"] == pytest.approx(0.0, abs=1e-6)
    assert r["ORIENT"] == pytest.approx(0.0, abs=1e-6)


def test_nuscenes_ap_vs_independent_devkit_model():
    """Cross-check _ClassAccumulator against an independent re-statement of
    the devkit algorithm (nuscenes-devkit detection/algo.py accumulate +
    calc_ap, re-implemented here from the published algorithm): global
    confidence-ordered greedy center-distance matching, 101-point recall
    interpolation, recall/precision floors at 0.1."""
    import numpy as np

    from efg_tpu.evaluator.nuscenes_evaluator import _ClassAccumulator

    rs = np.random.RandomState(0)
    frames = []
    for _ in range(6):
        n_gt = rs.randint(1, 8)
        gt = np.zeros((n_gt, 9))
        gt[:, :2] = rs.uniform(-40, 40, (n_gt, 2))
        gt[:, 3:6] = rs.uniform(1, 4, (n_gt, 3))
        gt[:, 8] = rs.uniform(-np.pi, np.pi, n_gt)
        n_det = rs.randint(0, 10)
        det = np.zeros((n_det, 9))
        # half the dets near GTs, half noise
        for i in range(n_det):
            if i % 2 == 0 and n_gt:
                det[i] = gt[i % n_gt]
                det[i, :2] += rs.randn(2) * 1.0
            else:
                det[i, :2] = rs.uniform(-40, 40, 2)
                det[i, 3:6] = rs.uniform(1, 4, 3)
        sc = rs.uniform(0, 1, n_det)
        frames.append((det, sc, gt))

    # ---- independent devkit-model computation (per threshold) ----------
    def devkit_ap(thr):
        # flatten with frame ids, sort globally by confidence
        rows = []
        for fi, (det, sc, gt) in enumerate(frames):
            for i in range(len(det)):
                rows.append((sc[i], fi, i))
        rows.sort(key=lambda r: -r[0])
        taken = {fi: np.zeros(len(gt), bool) for fi, (_, _, gt) in enumerate(frames)}
        tp, fp = [], []
        npos = sum(len(gt) for _, _, gt in frames)
        for sc_i, fi, i in rows:
            det, _, gt = frames[fi]
            best, bestd = None, thr
            for j in range(len(gt)):
                if taken[fi][j]:
                    continue
                d = np.linalg.norm(det[i, :2] - gt[j, :2])
                if d < bestd:
                    best, bestd = j, d
            if best is not None:
                taken[fi][best] = True
                tp.append(1); fp.append(0)
            else:
                tp.append(0); fp.append(1)
        tp = np.cumsum(tp); fp = np.cumsum(fp)
        rec = tp / npos
        prec = tp / np.maximum(tp + fp, 1e-9)
        rec_interp = np.linspace(0, 1, 101)
        prec = np.interp(rec_interp, rec, prec, right=0)
        prec = prec[round(100 * 0.1) + 1 :]
        prec = prec - 0.1
        prec[prec < 0] = 0
        return float(np.mean(prec)) / (1.0 - 0.1)

    acc = _ClassAccumulator()
    for det, sc, gt in frames:
        acc.frames.append(dict(det=det, scores=sc, gt=gt))
    got = acc.ap_and_tp()
    for thr in (0.5, 1.0, 2.0, 4.0):
        np.testing.assert_allclose(
            got[f"AP@{thr}"], devkit_ap(thr), atol=1e-9,
            err_msg=f"thr={thr}",
        )


def test_nuscenes_attribute_assignment_rule():
    """Reference velocity rule + class priors
    (`efg/evaluator/nuscenes_evaluator.py:136-162`)."""
    from efg_tpu.evaluator.nuscenes_evaluator import assign_attribute

    assert assign_attribute("car", 0.5) == "vehicle.moving"
    assert assign_attribute("truck", 1.0) == "vehicle.moving"
    assert assign_attribute("bicycle", 1.0) == "cycle.with_rider"
    assert assign_attribute("bicycle", 0.0) == "cycle.without_rider"  # prior argmax
    assert assign_attribute("car", 0.0) == "vehicle.parked"  # prior argmax
    assert assign_attribute("bus", 0.0) == "vehicle.stopped"
    assert assign_attribute("pedestrian", 0.1) == "pedestrian.standing"
    assert assign_attribute("pedestrian", 0.5) == "pedestrian.moving"  # prior argmax
    assert assign_attribute("traffic_cone", 1.0) == ""
    assert assign_attribute("barrier", 0.0) == ""


def test_nuscenes_aae_changes_nds():
    """Hand-built fixture: perfect boxes, varying GT attributes — AAE must
    be computed for real and move NDS."""
    from types import SimpleNamespace

    from efg_tpu.evaluator.nuscenes_evaluator import nuScenesDetEvaluator

    cfg = SimpleNamespace(dataset=SimpleNamespace(classes=["car", "pedestrian"]))

    def run(gt_attrs):
        ev = nuScenesDetEvaluator(cfg, None)
        gt = np.zeros((3, 9), np.float32)
        gt[:, :2] = [[0, 0], [10, 0], [0, 10]]
        gt[:, 3:6] = [[4, 2, 1.6], [4, 2, 1.6], [0.8, 0.8, 1.8]]
        gt[0, 6:8] = [1.0, 0.0]  # moving car
        labels = np.array([1, 1, 2], np.int64)  # car, car, pedestrian
        inputs = {"annotations": [dict(gt_boxes=gt, labels=labels,
                                       gt_attrs=np.asarray(gt_attrs))]}
        outputs = {
            "valid": np.ones((1, 3), bool)[None][0],
            "box3d": gt[None],
            "scores": np.array([[0.9, 0.8, 0.85]], np.float32),
            "labels": labels[None],
        }
        ev.process(inputs, outputs)
        return ev.evaluate()

    # predicted attrs: car@speed1 -> vehicle.moving, car@0 -> vehicle.parked
    # (prior), ped@0 -> pedestrian.standing
    r_match = run(["vehicle.moving", "vehicle.parked", "pedestrian.standing"])
    assert r_match["nusc/mAAE"] == pytest.approx(0.0, abs=1e-9)

    r_miss = run(["vehicle.moving", "vehicle.stopped", "pedestrian.standing"])
    # car class: 1 of 2 attributed TPs wrong -> class AAE 0.5; ped 0.0
    assert r_miss["nusc/mAAE"] == pytest.approx(0.25, abs=1e-9)
    assert r_miss["nusc/NDS"] < r_match["nusc/NDS"]
    # the 0.25 attribute error costs exactly 0.025 NDS
    assert r_match["nusc/NDS"] - r_miss["nusc/NDS"] == pytest.approx(0.025, abs=1e-9)

    # GTs without attributes are skipped (devkit rule): attribute error
    # stays 0 when only unattributed GTs would have mismatched
    r_skip = run(["vehicle.moving", "", "pedestrian.standing"])
    assert r_skip["nusc/mAAE"] == pytest.approx(0.0, abs=1e-9)


def test_nuscenes_barrier_cone_excluded_from_attr_vel():
    from types import SimpleNamespace

    from efg_tpu.evaluator.nuscenes_evaluator import nuScenesDetEvaluator

    cfg = SimpleNamespace(dataset=SimpleNamespace(classes=["barrier", "traffic_cone"]))
    ev = nuScenesDetEvaluator(cfg, None)
    gt = np.zeros((2, 9), np.float32)
    gt[:, :2] = [[0, 0], [5, 0]]
    gt[:, 3:6] = 1.0
    labels = np.array([1, 2], np.int64)
    ev.process(
        {"annotations": [dict(gt_boxes=gt, labels=labels,
                              gt_attrs=np.asarray(["", ""]))]},
        {"valid": np.ones((1, 2), bool), "box3d": gt[None],
         "scores": np.array([[0.9, 0.9]], np.float32), "labels": labels[None]},
    )
    r = ev.evaluate()
    # no attribute/velocity-capable class present -> worst-case constants
    assert r["nusc/mAAE"] == 1.0
    assert r["nusc/mAVE"] == 1.0
    assert r["nusc/mAP"] > 0.95
