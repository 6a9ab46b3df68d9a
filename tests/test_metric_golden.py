"""Golden analytic fixtures for the metric cores (VERDICT r2 item 10).

The official kits (`waymo_open_dataset`, `nuscenes-devkit`) are not
installable here, so instead of recorded outputs these tests pin the metric
cores to END-TO-END expected values derived BY HAND from the protocol
definitions (metrics.proto AP integration; devkit calc_ap normalization):
every number below is computed analytically in the comments, not by running
the code under test. Scores sit strictly between cutoff grid points so the
expected per-cutoff counts are float-exact.
"""

import numpy as np
import pytest

from efg_tpu.evaluator.nuscenes_evaluator import _ClassAccumulator
from efg_tpu.evaluator.waymo_official import (
    OfficialAccumulator,
    WaymoOfficialCalculator,
    compute_ap,
)


# ---------------------------------------------------------------------------
# compute_ap: hand-integrable precision/recall curves
# ---------------------------------------------------------------------------


def test_compute_ap_constant_precision():
    # fine sampling (no gap > 0.05): AP = p · recall-span = 0.8 · 1.0
    r = np.linspace(1.0, 0.0, 41)  # descending (ascending cutoff)
    p = np.full(41, 0.8)
    assert compute_ap(p, r) == pytest.approx(0.8, abs=1e-9)


def test_compute_ap_single_point_conservative_fill():
    # one sampled point (r=1, p=0.5): the whole unsampled span fills at the
    # sampled precision (seed prev_p = first sampled p, never 1.0):
    # AP = 0.05·max(0.5, 0.5) + 0.95·0.5 = 0.5
    assert compute_ap(np.array([0.5]), np.array([1.0])) == pytest.approx(0.5, abs=1e-9)


def test_compute_ap_envelope_step():
    # 41 samples at Δr = 0.025 (safely under the 0.05 gap rule — exact
    # 0.05 steps float-round above it): p = 1.0 for r ≤ 0.5 and 0.2
    # above. Envelope keeps the step; AP = 0.5·1.0 + 0.5·0.2 = 0.6
    r = np.linspace(1.0, 0.0, 41)
    p = np.where(r > 0.5, 0.2, 1.0)
    assert compute_ap(p, r) == pytest.approx(0.6, abs=1e-9)


# ---------------------------------------------------------------------------
# OfficialAccumulator: one frame, hand-traced cutoff table
# ---------------------------------------------------------------------------


def _sq(x, y, yaw=0.0):
    """2×2×2 square-footprint box (yaw-invariant BEV footprint)."""
    return [x, y, 0.0, 2.0, 2.0, 2.0, yaw]


def test_official_accumulator_hand_traced():
    """2 GT (both in-level), 3 preds: exact match (s=.905), square box with
    a π/2 heading error (IoU 1, hacc 0.5, s=.655), far FP (s=.355).

    Cutoff table (k = #preds with score ≥ cutoff):
      c ∈ [0.00, 0.35]: k=3 → TP=2 FP=1  p=2/3 r=1    ph=1.5/3=0.5
      c ∈ [0.36, 0.65]: k=2 → TP=2 FP=0  p=1   r=1    ph=0.75
      c ∈ [0.66, 0.90]: k=1 → TP=1 FP=0  p=1   r=0.5  ph=1.0
      c ∈ [0.91, 1.00]: k=0 →            p=0   r=0    ph=0

    AP: envelope precision is 1.0 up to r=1 (the p=1 samples at r=1
    dominate the 2/3 ones), both 0→0.5 and 0.5→1 recall jumps fill at
    precision 1 → AP = 1.0.
    APH: envelope ph samples: 1.0 at r∈{0,0.5}, 0.75 at r=1 (the 0.5
    samples are enveloped up to 0.75). Integration: jump 0→0.5 at ph=1
    gives 0.05·1 + 0.45·1 = 0.5; jump 0.5→1 at ph=0.75 gives
    0.05·max(1,0.75) + 0.45·0.75 = 0.3875 → APH = 0.8875.
    """
    acc = OfficialAccumulator(iou_threshold=0.7, level=1)
    preds = np.array(
        [_sq(0, 0), _sq(20, 0, yaw=np.pi / 2), _sq(40, 0)], np.float64
    )
    scores = np.array([0.905, 0.655, 0.355])
    gts = np.array([_sq(0, 0), _sq(20, 0)], np.float64)
    acc.add_frame(preds, scores, gts, np.ones(2, bool))

    # spot-check the raw cutoff cells against the hand table
    ci = {c: i for i, c in enumerate(np.round(acc.cutoffs, 2))}
    for c, (tp, fp, h) in {
        0.00: (2, 1, 1.5), 0.35: (2, 1, 1.5),
        0.36: (2, 0, 1.5), 0.65: (2, 0, 1.5),
        0.66: (1, 0, 1.0), 0.90: (1, 0, 1.0),
        0.91: (0, 0, 0.0), 1.00: (0, 0, 0.0),
    }.items():
        i = ci[c]
        assert acc.tp[i] == tp and acc.fp[i] == fp, c
        assert acc.hsum[i] == pytest.approx(h, abs=1e-12), c
        assert acc.fn[i] == 2 - tp, c

    res = acc.compute()
    assert res["AP"] == pytest.approx(1.0, abs=1e-9)
    assert res["APH"] == pytest.approx(0.8875, abs=1e-9)


def test_official_calculator_l2_ignored_prediction():
    """A difficulty-2 GT absorbs its matching prediction: the L1 cell sees
    neither TP nor FP (ignored) and has no in-level GT → AP undefined (nan);
    the L2 cell scores a clean AP = 1.0."""
    calc = WaymoOfficialCalculator(["VEHICLE"], {"VEHICLE": 0.7})
    calc.add_frame(
        pred_boxes=np.array([_sq(0, 0)], np.float64),
        pred_scores=np.array([0.505]),
        pred_labels=np.array([1]),
        gt_boxes=np.array([_sq(0, 0)], np.float64),
        gt_labels=np.array([1]),
        gt_difficulty=np.array([2]),
    )
    out = calc.compute()
    assert np.isnan(out["VEHICLE/L1/AP"])
    assert out["VEHICLE/L2/AP"] == pytest.approx(1.0, abs=1e-9)
    # the ignored prediction must not surface as an L1 false positive
    l1 = calc.cells[("VEHICLE", "L1")]
    assert l1.fp.sum() == 0 and l1.tp.sum() == 0


# ---------------------------------------------------------------------------
# nuScenes _ClassAccumulator: devkit calc_ap arithmetic by hand
# ---------------------------------------------------------------------------


def _nusc_box(x, y, yaw=0.0, size=(4.0, 2.0, 2.0), vel=(0.0, 0.0)):
    # [x, y, z, dx, dy, dz, vx, vy, yaw]
    return [x, y, 0.0, *size, *vel, yaw]


def test_nuscenes_ap_and_tp_hand_traced():
    """3 GTs; dets: TP at 0.5 m (s=.9), far FP (s=.8), TP at 1.5 m (s=.7).

    At thr=2.0: conf-ordered tps = [T, F, T] → tp_cum=[1,1,2],
    recall=[1/3,1/3,2/3], precision=[1,1/2,2/3].
    np.interp over the 101-point recall grid: 1.0 below 1/3, the
    (1/3,0.5)→(2/3,2/3) segment in between (duplicate x=1/3 keeps the
    later sample, the devkit convention), 0 beyond 2/3 (right=0).
    calc_ap drops grid indices 0..10 (90 kept), floors at 0.1, and
    normalizes by (1 − 0.1) — i.e. AP = Σ(p−0.1)⁺ / (90·0.9):
      Σ r=0.11..0.33 (23 pts): 0.9 each               = 20.70
      Σ r=0.34..0.66 (33 pts): 0.4 + 0.5·(r − 1/3)    = 13.2 + 2.75
      Σ r=0.67..1.00: 0
    AP@2.0 = 36.65 / 81 = 0.452469…
    TP errors (2 m matches): ATE = mean(0.5, 1.5) = 1.0, ASE = 0 (equal
    sizes), AOE = mean(0.3, 0.1) = 0.2, AVE = 0.
    At thr=0.5: only the 0.5 m det matches — but d2[j] < thr is strict, so
    the 0.5 m det does NOT match at thr=0.5 → AP@0.5 = 0.
    """
    acc = _ClassAccumulator()
    det = np.array(
        [
            _nusc_box(0.5, 0.0, yaw=0.3),
            _nusc_box(50.0, 50.0),
            _nusc_box(20.0, 1.5, yaw=0.1),
        ],
        np.float64,
    )
    gt = np.array(
        [_nusc_box(0, 0), _nusc_box(10, 0), _nusc_box(20, 0)], np.float64
    )
    acc.frames.append(dict(det=det, scores=np.array([0.9, 0.8, 0.7]), gt=gt))
    out = acc.ap_and_tp()

    assert out["AP@2.0"] == pytest.approx(36.65 / 81, abs=1e-9)
    assert out["AP@0.5"] == pytest.approx(0.0, abs=1e-9)
    assert out["TRANS"] == pytest.approx(1.0, abs=1e-12)
    assert out["SCALE"] == pytest.approx(0.0, abs=1e-12)
    assert out["ORIENT"] == pytest.approx(0.2, abs=1e-12)
    assert out["VEL"] == pytest.approx(0.0, abs=1e-12)


def test_nuscenes_ap_perfect_detector():
    # every GT matched at zero distance with no FPs: interp precision is 1
    # on the whole grid → AP = (0.9·90)/(0.9·90)… i.e. exactly 1.0 at every
    # threshold after the floor-and-rescale
    acc = _ClassAccumulator()
    gt = np.array([_nusc_box(0, 0), _nusc_box(10, 0)], np.float64)
    acc.frames.append(dict(det=gt.copy(), scores=np.array([0.9, 0.8]), gt=gt))
    out = acc.ap_and_tp()
    for t in (0.5, 1.0, 2.0, 4.0):
        assert out[f"AP@{t}"] == pytest.approx(1.0, abs=1e-9)
    assert out["TRANS"] == 0.0 and out["ORIENT"] == 0.0
