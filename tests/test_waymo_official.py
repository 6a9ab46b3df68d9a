"""Official-protocol Waymo metric core vs independent brute-force twins."""

import itertools

import numpy as np
import pytest

pytest.importorskip("jax")
from scipy.optimize import linear_sum_assignment

from efg_tpu.evaluator.waymo_official import (
    NUM_CUTOFFS,
    OfficialAccumulator,
    WaymoOfficialCalculator,
    compute_ap,
    hungarian_match,
    score_cutoffs,
)


def _brute_max_weight(iou, thr):
    """Exhaustive maximum-total-IoU matching over IoU>=thr pairs."""
    n, m = iou.shape
    best, best_pairs = -1.0, []
    preds = list(range(n))
    for k in range(0, min(n, m) + 1):
        for ps in itertools.permutations(preds, k):
            for gs in itertools.combinations(range(m), k):
                w = 0.0
                ok = True
                for a, b in zip(ps, gs):
                    if iou[a, b] < thr:
                        ok = False
                        break
                    w += iou[a, b]
                if ok and w > best + 1e-12:
                    best, best_pairs = w, list(zip(ps, gs))
    return best, best_pairs


def test_hungarian_match_is_max_weight():
    rs = np.random.RandomState(0)
    for trial in range(30):
        n, m = rs.randint(0, 5), rs.randint(0, 5)
        iou = rs.uniform(0, 1, (n, m))
        thr = 0.3
        match = hungarian_match(iou, thr)
        got_w = sum(iou[match[j], j] for j in range(m) if match[j] >= 0)
        # validity
        used = [match[j] for j in range(m) if match[j] >= 0]
        assert len(used) == len(set(used))
        for j in range(m):
            if match[j] >= 0:
                assert iou[match[j], j] >= thr
        best_w, _ = _brute_max_weight(iou, thr)
        assert got_w >= best_w - 1e-9, (trial, got_w, best_w)


class _SlowAccumulator:
    """Direct spec implementation: full-matrix Hungarian at every cutoff."""

    def __init__(self, thr):
        self.thr = thr
        self.cutoffs = score_cutoffs()
        self.tp = np.zeros(NUM_CUTOFFS)
        self.fp = np.zeros(NUM_CUTOFFS)
        self.fn = np.zeros(NUM_CUTOFFS)
        self.hsum = np.zeros(NUM_CUTOFFS)

    def add_frame(self, pb, ps, gb, inc, iou):
        for ci, c in enumerate(self.cutoffs):
            keep = ps >= c
            sub = iou[keep]
            n, m = sub.shape
            match = np.full(m, -1, np.int64)
            if n and m:
                w = np.where(sub >= self.thr, sub, 0.0)
                ri, cj = linear_sum_assignment(-w)
                for a, b in zip(ri, cj):
                    if w[a, b] > 0:
                        match[b] = a
            kept_idx = np.nonzero(keep)[0]
            tp = fp = 0
            h = 0.0
            ignored = set()
            for j in range(m):
                if match[j] >= 0:
                    if inc[j]:
                        tp += 1
                        d = abs(pb[kept_idx[match[j]], 6] - gb[j, 6]) % (2 * np.pi)
                        d = min(d, 2 * np.pi - d)
                        h += max(0.0, 1 - d / np.pi)
                    else:
                        ignored.add(match[j])
            fp = n - tp - len(ignored)
            self.tp[ci] += tp
            self.fp[ci] += fp
            self.fn[ci] += int(inc.sum()) - tp
            self.hsum[ci] += h


def test_accumulator_matches_slow_spec():
    from efg_tpu.evaluator.det3d_metrics import _bev_iou_matrix

    rs = np.random.RandomState(1)
    thr = 0.5
    fast = OfficialAccumulator(thr, 2)
    slow = _SlowAccumulator(thr)
    for _ in range(6):
        m = rs.randint(0, 6)
        n = rs.randint(0, 8)
        gb = np.zeros((m, 7), np.float32)
        gb[:, :2] = rs.uniform(-20, 20, (m, 2))
        gb[:, 2] = 0.5
        gb[:, 3:6] = rs.uniform(2, 5, (m, 3))
        gb[:, 6] = rs.uniform(-np.pi, np.pi, m)
        # predictions: some near-GT copies + noise
        pb = np.zeros((n, 7), np.float32)
        for i in range(n):
            if m and rs.rand() < 0.7:
                j = rs.randint(m)
                pb[i] = gb[j]
                pb[i, :2] += rs.randn(2) * 0.5
                pb[i, 6] += rs.randn() * 0.3
            else:
                pb[i, :2] = rs.uniform(-20, 20, 2)
                pb[i, 3:6] = rs.uniform(2, 5, 3)
        ps = rs.uniform(0, 1, n).astype(np.float32)
        inc = rs.rand(m) < 0.8
        # sort predictions by score desc for BOTH (spec is order-free, the
        # fast path sorts internally; mirror its iou input for exactness)
        order = np.argsort(-ps, kind="stable")
        pb, ps = pb[order], ps[order]
        iou = _bev_iou_matrix(pb, gb) if n and m else np.zeros((n, m))
        fast.add_frame(pb, ps, gb, inc)
        slow.add_frame(pb, ps, gb, inc, iou)

    np.testing.assert_allclose(fast.tp, slow.tp)
    np.testing.assert_allclose(fast.fp, slow.fp)
    np.testing.assert_allclose(fast.fn, slow.fn)
    np.testing.assert_allclose(fast.hsum, slow.hsum, atol=1e-6)


def test_compute_ap_known_values():
    # perfect detector: precision 1 at every sampled recall
    p = np.ones(NUM_CUTOFFS)
    r = np.linspace(1, 0, NUM_CUTOFFS)
    assert compute_ap(p, r) == pytest.approx(1.0)
    # constant precision 0.5 over full recall
    assert compute_ap(p * 0.5, r) == pytest.approx(0.5)
    # single point at recall 1 (all others 0 recall): big gap filled
    p2 = np.zeros(NUM_CUTOFFS)
    p2[0] = 1.0
    r2 = np.zeros(NUM_CUTOFFS)
    r2[0] = 1.0
    ap = compute_ap(p2, r2)
    assert 0.0 < ap <= 1.0


def test_calculator_perfect_predictions():
    rs = np.random.RandomState(3)
    calc = WaymoOfficialCalculator(["VEHICLE"], {"VEHICLE": 0.7})
    for _ in range(4):
        m = 5
        gb = np.zeros((m, 7), np.float32)
        gb[:, :2] = rs.uniform(-30, 30, (m, 2))
        gb[:, 3:6] = rs.uniform(3, 5, (m, 3))
        gb[:, 6] = rs.uniform(-np.pi, np.pi, m)
        calc.add_frame(
            gb, np.full(m, 0.9, np.float32), np.ones(m, np.int64),
            gb, np.ones(m, np.int64),
        )
    res = calc.compute()
    assert res["VEHICLE/L2/AP"] == pytest.approx(1.0, abs=1e-6)
    assert res["VEHICLE/L2/APH"] == pytest.approx(1.0, abs=1e-6)


def test_calculator_l1_ignores_hard_matches():
    # one L2-only GT matched by one prediction: L1 must ignore that pred
    gb = np.array([[0, 0, 0, 4, 4, 2, 0.0]], np.float32)
    calc = WaymoOfficialCalculator(["VEHICLE"], {"VEHICLE": 0.7})
    calc.add_frame(
        gb, np.array([0.9], np.float32), np.array([1]),
        gb, np.array([1]), gt_difficulty=np.array([2]),
    )
    res = calc.compute()
    assert np.isnan(res["VEHICLE/L1/AP"])  # no L1 GT at all
    assert res["VEHICLE/L2/AP"] == pytest.approx(1.0, abs=1e-6)
