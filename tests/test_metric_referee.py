"""Referee the metric referees (VERDICT r3 item 6).

The Waymo detection/tracking metric cores are validated here against a
fully independent, definition-level reimplementation of the official
protocol, written from the published spec with NO shared code:

- IoU: inline Sutherland-Hodgman BEV polygon clip × z-overlap (the
  evaluator uses `ops.iou_rotated.iou_3d`, a different clipping
  implementation).
- Matching: exhaustive enumeration over all injective assignments
  maximizing total IoU among pairs ≥ threshold (the evaluator uses
  connected components + scipy Hungarian).
- Accumulation: direct per-cutoff loops over all 101 cutoffs.
- AP: direct envelope + conservative-gap integration per metrics.proto.

The official `waymo_open_dataset` tool is not installable in this
environment (no network, devkit absent), so official-binary output vectors
are unobtainable; an independent reimplementation cross-checked on
randomized scenes is the strongest referee available offline. An
off-by-protocol bug would have to be made identically in two structurally
different implementations to pass.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from efg_tpu.evaluator.waymo_official import WaymoOfficialCalculator
from efg_tpu.evaluator.waymo_tracking import WaymoTrackingMetric

# ---------------------------------------------------------------------------
# independent IoU: Sutherland-Hodgman polygon clip (BEV) × z overlap
# ---------------------------------------------------------------------------


def _bev_corners(box):
    x, y, _, dx, dy, _, yaw = box[:7]
    c, s = np.cos(yaw), np.sin(yaw)
    # CCW winding (the half-plane clipper keeps the left side of each edge)
    local = np.array(
        [[dx / 2, dy / 2], [-dx / 2, dy / 2], [-dx / 2, -dy / 2], [dx / 2, -dy / 2]]
    )
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    x, y = np.asarray(poly).T
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _clip(subject, a, b):
    """Clip polygon by half-plane left of directed edge a->b."""
    out = []
    n = len(subject)
    for i in range(n):
        p, q = subject[i], subject[(i + 1) % n]
        side_p = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        side_q = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if side_p >= 0:
            out.append(p)
        if (side_p >= 0) != (side_q >= 0):
            t = side_p / (side_p - side_q)
            out.append(p + t * (q - p))
    return out


def ref_iou3d(boxa, boxb) -> float:
    pa, pb = _bev_corners(boxa), _bev_corners(boxb)
    poly = list(pa)
    for i in range(4):
        if not poly:
            break
        poly = _clip(poly, pb[i], pb[(i + 1) % 4])
    inter_bev = _poly_area(poly)
    za = (boxa[2] - boxa[5] / 2, boxa[2] + boxa[5] / 2)
    zb = (boxb[2] - boxb[5] / 2, boxb[2] + boxb[5] / 2)
    zi = max(0.0, min(za[1], zb[1]) - max(za[0], zb[0]))
    inter = inter_bev * zi
    va = boxa[3] * boxa[4] * boxa[5]
    vb = boxb[3] * boxb[4] * boxb[5]
    return inter / max(va + vb - inter, 1e-9)


# ---------------------------------------------------------------------------
# independent matcher: exhaustive max-total-IoU assignment
# ---------------------------------------------------------------------------


def brute_match(iou: np.ndarray, thr: float):
    """Best injective pred->gt assignment maximizing total IoU among pairs
    with IoU >= thr. Returns gt->pred match vector. Exponential; N,M small."""
    n, m = iou.shape
    best_total, best = -1.0, np.full(m, -1, np.int64)
    preds = list(range(n))
    for k in range(0, min(n, m) + 1):
        for gts in itertools.combinations(range(m), k):
            for ps in itertools.permutations(preds, k):
                tot, ok = 0.0, True
                for g, p in zip(gts, ps):
                    if iou[p, g] < thr:
                        ok = False
                        break
                    tot += iou[p, g]
                if ok and tot > best_total:
                    best_total = tot
                    best = np.full(m, -1, np.int64)
                    for g, p in zip(gts, ps):
                        best[g] = p
    return best


# ---------------------------------------------------------------------------
# independent AP: direct per-cutoff accumulation + proto integration
# ---------------------------------------------------------------------------


def _heading_acc(py, gy):
    d = abs(py - gy) % (2 * np.pi)
    d = min(d, 2 * np.pi - d)
    return max(0.0, 1.0 - d / np.pi)


def brute_official_ap(frames, thr, level):
    """frames: list of (pred_boxes, scores, gt_boxes, gt_l1_mask)."""
    cutoffs = np.concatenate([np.arange(100) * 0.01, [1.0]])
    tp = np.zeros(101)
    fp = np.zeros(101)
    fn = np.zeros(101)
    hs = np.zeros(101)
    for pb, ps, gb, l1 in frames:
        in_level = l1 if level == 1 else np.ones(len(gb), bool)
        iou = np.array([[ref_iou3d(p, g) for g in gb] for p in pb]).reshape(len(pb), len(gb))
        for ci, c in enumerate(cutoffs):
            keep = ps >= c
            sub = iou[keep]
            match = brute_match(sub, thr) if len(gb) and keep.sum() else np.full(len(gb), -1)
            kept_boxes = pb[keep]
            n_tp = n_ign = 0
            for g in range(len(gb)):
                p = match[g]
                if p >= 0 and in_level[g]:
                    n_tp += 1
                    hs[ci] += _heading_acc(kept_boxes[p][6], gb[g][6])
                elif p >= 0:
                    n_ign += 1
            tp[ci] += n_tp
            fp[ci] += int(keep.sum()) - n_tp - n_ign
            fn[ci] += int(in_level.sum()) - n_tp
    prec = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 0.0)
    ph = np.where(tp + fp > 0, hs / np.maximum(tp + fp, 1), 0.0)
    rec = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1), 0.0)
    return brute_integrate(prec, rec), brute_integrate(ph, rec)


def brute_integrate(prec, rec, max_delta=0.05):
    # ascending-recall order; envelope = running max from the high-recall end
    r = rec[::-1].copy()
    p = prec[::-1].copy()
    for i in range(len(p) - 2, -1, -1):
        p[i] = max(p[i], p[i + 1])
    ap, pr, pp = 0.0, 0.0, (p[0] if len(p) else 0.0)
    for ri, pi in zip(r, p):
        d = ri - pr
        if d <= 0:
            pp = max(pp, pi)
            continue
        if d > max_delta:
            ap += max_delta * max(pp, pi) + (d - max_delta) * pi
        else:
            ap += d * pi
        pr, pp = ri, pi
    return float(ap)


# ---------------------------------------------------------------------------
# randomized scenes
# ---------------------------------------------------------------------------


def _random_frame(rs, n_pred=4, n_gt=3):
    gb = np.zeros((n_gt, 7))
    gb[:, :2] = rs.uniform(-15, 15, (n_gt, 2))
    gb[:, 2] = rs.uniform(-0.5, 0.5, n_gt)
    gb[:, 3:6] = rs.uniform(2.5, 5.0, (n_gt, 3))
    gb[:, 6] = rs.uniform(-np.pi, np.pi, n_gt)
    # predictions: jittered GTs + one random spurious box
    pb = np.zeros((n_pred, 7))
    for i in range(n_pred):
        src = gb[i % n_gt]
        pb[i] = src + np.concatenate([rs.uniform(-0.8, 0.8, 3), rs.uniform(-0.4, 0.4, 3), rs.uniform(-0.3, 0.3, 1)])
    ps = rs.uniform(0.05, 0.95, n_pred)
    l1 = rs.random(n_gt) < 0.7
    return pb, ps, gb, l1


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("level", [1, 2])
def test_detection_ap_matches_independent_brute_force(seed, level):
    rs = np.random.RandomState(seed)
    frames = [_random_frame(rs) for _ in range(4)]
    thr = 0.5

    calc = WaymoOfficialCalculator(["VEHICLE"], {"VEHICLE": thr})
    for pb, ps, gb, l1 in frames:
        calc.add_frame(
            pb, ps, np.ones(len(pb), np.int64),
            gb, np.ones(len(gb), np.int64),
            gt_difficulty=np.where(l1, 1, 2),
        )
    got = calc.compute()
    ap, aph = brute_official_ap(frames, thr, level)
    np.testing.assert_allclose(got[f"VEHICLE/L{level}/AP"], ap, atol=2e-3)
    np.testing.assert_allclose(got[f"VEHICLE/L{level}/APH"], aph, atol=2e-3)


# ---------------------------------------------------------------------------
# tracking referee: independent CLEAR-MOT accumulation
# ---------------------------------------------------------------------------


def brute_clear_mot(frames, thr, cutoffs, level):
    """frames: list of (pb, ps, tids, gb, gids, gdiff). Returns best-cutoff
    (MOTA, MOTP)."""
    nc = len(cutoffs)
    miss = np.zeros(nc)
    fp = np.zeros(nc)
    mism = np.zeros(nc)
    nmatch = np.zeros(nc)
    cost = np.zeros(nc)
    n_gt = 0
    last = [dict() for _ in range(nc)]
    for pb, ps, tids, gb, gids, gdiff in frames:
        in_level = (gdiff <= 1) if level == 1 else np.ones(len(gb), bool)
        n_gt += int(in_level.sum())
        iou = np.array([[ref_iou3d(p, g) for g in gb] for p in pb]).reshape(len(pb), len(gb))
        for ci, c in enumerate(cutoffs):
            keep = np.nonzero(ps >= c)[0]
            match = brute_match(iou[keep], thr) if len(keep) and len(gb) else np.full(len(gb), -1)
            n_tp = n_ign = 0
            for g in range(len(gb)):
                p = match[g]
                if p < 0:
                    continue
                if not in_level[g]:
                    n_ign += 1
                    continue
                n_tp += 1
                tid, gid = int(tids[keep[p]]), int(gids[g])
                if last[ci].get(gid) is not None and last[ci][gid] != tid:
                    mism[ci] += 1
                last[ci][gid] = tid
                nmatch[ci] += 1
                cost[ci] += 1.0 - iou[keep[p], g]
            miss[ci] += int(in_level.sum()) - n_tp
            fp[ci] += len(keep) - n_tp - n_ign
    mota = 1.0 - (miss + fp + mism) / max(n_gt, 1)
    best = int(np.argmax(mota))
    return float(mota[best]), float(cost[best] / max(nmatch[best], 1))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tracking_mota_matches_independent_brute_force(seed):
    rs = np.random.RandomState(100 + seed)
    thr = 0.4
    cutoffs = np.arange(0.0, 1.0, 0.05)
    metric = WaymoTrackingMetric(["VEHICLE"], {"VEHICLE": thr})

    frames = []
    # persistent 3-object scene over 5 frames with drifting tracks + id swap
    gb0 = np.zeros((3, 7))
    gb0[:, :2] = rs.uniform(-12, 12, (3, 2))
    gb0[:, 3:6] = rs.uniform(3, 5, (3, 3))
    gb0[:, 6] = rs.uniform(-np.pi, np.pi, 3)
    for t in range(5):
        gb = gb0.copy()
        gb[:, 0] += 0.6 * t
        pb = gb + np.concatenate(
            [rs.uniform(-0.6, 0.6, (3, 3)), rs.uniform(-0.3, 0.3, (3, 3)),
             rs.uniform(-0.2, 0.2, (3, 1))], axis=1)
        ps = rs.uniform(0.1, 0.95, 3)
        tids = np.array([0, 1, 2]) if t < 3 else np.array([0, 2, 1])  # id swap
        gids = np.arange(3)
        gdiff = np.array([1, 1, 2])
        frames.append((pb, ps, tids, gb, gids, gdiff))
        metric.add_frame(
            "seq0", pb, ps, np.ones(3, np.int64), tids,
            gb, np.ones(3, np.int64), gids, gdiff,
        )

    got = metric.compute()
    for level in (1, 2):
        mota, motp = brute_clear_mot(frames, thr, cutoffs, level)
        np.testing.assert_allclose(got[f"VEHICLE_L{level}"]["MOTA"], mota, atol=2e-3)
        np.testing.assert_allclose(got[f"VEHICLE_L{level}"]["MOTP"], motp, atol=2e-3)
