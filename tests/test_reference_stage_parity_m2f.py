"""Mask2Former criterion/matcher stage parity vs the reference torch code.

The reference SetCriterion + HungarianMatcher (`/root/reference/playground/
panoptic_seg/coco/mask2former/mask2former.pano_coco.res50.bs16.50e/
{criterion.py, matcher.py}`) are pure torch + scipy, importable on CPU with
light stubs (`efg.data.structures.boxes.cat`, `efg.utils.distributed`,
`utils.misc`). These tests feed IDENTICAL inputs through the reference and
the efg_tpu jax code and assert:

- `point_sample` (grid_sample align_corners=False) vs `_sample_points`
- matcher cost matrices (class + point BCE + dice, `matcher.py:118-158`)
  and the resulting Hungarian assignment
- `loss_labels` (weighted CE with eos weight, `criterion.py:157-171`)
- `loss_masks` end-to-end with the PointRend importance-sampled point set
  (`criterion.py:15-66,173-215`) under identical random draws, vs
  `uncertainty_point_coords` + `point_mask_losses`
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

REF_EXP = (
    "/root/reference/playground/panoptic_seg/coco/mask2former/"
    "mask2former.pano_coco.res50.bs16.50e"
)

W = dict(w_ce=2.0, w_bce=5.0, w_dice=5.0)


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref():
    def nested_from_list(tensors):
        # pad along dim 0 to the max count (H, W equal in these tests),
        # as the reference's nested_tensor_from_tensor_list does
        n = max(t.shape[0] for t in tensors)
        t = torch.stack(
            [
                torch.cat([x, x.new_zeros((n - x.shape[0],) + x.shape[1:])])
                for x in tensors
            ]
        )
        m = torch.zeros((t.shape[0],) + t.shape[2:], dtype=torch.bool)

        class _NT:
            def decompose(self):
                return t, m

        return _NT()

    _stub("efg")
    _stub("efg.data")
    _stub("efg.data.structures")
    _stub("efg.data.structures.boxes", cat=torch.cat)
    _stub("efg.utils")
    _stub("efg.utils.distributed", get_world_size=lambda: 1)
    _stub("utils")
    _stub(
        "utils.misc",
        is_dist_avail_and_initialized=lambda: False,
        nested_tensor_from_tensor_list=nested_from_list,
    )
    sys.path.insert(0, REF_EXP)
    import criterion as ref_criterion
    import matcher as ref_matcher

    yield types.SimpleNamespace(cr=ref_criterion, mt=ref_matcher)
    sys.path.remove(REF_EXP)


def _rand_problem(rs, b=2, q=8, gs=(3, 5), c=5, h=16, w=24, k=32):
    logits = rs.randn(b, q, c + 1).astype(np.float32)
    masks = (rs.randn(b, q, h, w) * 2).astype(np.float32)
    g_max = max(gs)
    gt_cls = np.zeros((b, g_max), np.int64)
    gt_masks = np.zeros((b, g_max, h, w), np.float32)
    gt_ok = np.zeros((b, g_max), bool)
    for i, g in enumerate(gs):
        gt_cls[i, :g] = rs.randint(0, c, g)
        gt_masks[i, :g] = (rs.rand(g, h, w) > 0.6).astype(np.float32)
        gt_ok[i, :g] = True
    pts = rs.rand(k, 2).astype(np.float32)
    return logits, masks, gt_cls, gt_masks, gt_ok, pts


def test_point_sample_parity(ref):
    from efg_tpu.models.mask2former import _sample_points

    rs = np.random.RandomState(0)
    m = rs.randn(3, 16, 24).astype(np.float32)
    p = rs.rand(50, 2).astype(np.float32)
    got = np.asarray(_sample_points(jnp.asarray(m), jnp.asarray(p)))
    want = ref.mt.point_sample(
        torch.from_numpy(m)[:, None],
        torch.from_numpy(p)[None].expand(3, -1, -1),
        align_corners=False,
    ).squeeze(1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _ref_cost(ref, logits_b, masks_b, gt_cls_b, gt_masks_b, pts):
    """The reference matcher's per-image C (matcher.py:118-158), feeding the
    shared point set explicitly instead of torch.rand."""
    out_prob = torch.from_numpy(logits_b).softmax(-1)
    cost_class = -out_prob[:, torch.from_numpy(gt_cls_b)]
    pc = torch.from_numpy(pts)[None]
    tgt = ref.mt.point_sample(
        torch.from_numpy(gt_masks_b)[:, None],
        pc.repeat(gt_masks_b.shape[0], 1, 1), align_corners=False,
    ).squeeze(1)
    out = ref.mt.point_sample(
        torch.from_numpy(masks_b)[:, None],
        pc.repeat(masks_b.shape[0], 1, 1), align_corners=False,
    ).squeeze(1)
    cost_mask = ref.mt.batch_sigmoid_ce_loss(out, tgt)
    cost_dice = ref.mt.batch_dice_loss(out, tgt)
    return (
        W["w_bce"] * cost_mask + W["w_ce"] * cost_class + W["w_dice"] * cost_dice
    ).numpy(), out.numpy(), tgt.numpy()


def test_matcher_cost_and_assignment_parity(ref):
    from scipy.optimize import linear_sum_assignment

    from efg_tpu.models.mask2former import _sample_points, matcher_cost
    from efg_tpu.ops.matcher import hungarian_match

    rs = np.random.RandomState(1)
    logits, masks, gt_cls, gt_masks, gt_ok, pts = _rand_problem(rs)
    b, q, _ = logits.shape
    k = pts.shape[0]

    prob = jax.nn.softmax(jnp.asarray(logits), -1)
    pred_pts = jax.vmap(lambda m: _sample_points(m, jnp.asarray(pts)))(
        jnp.asarray(masks)
    )
    gt_pts = jax.vmap(lambda m: _sample_points(m, jnp.asarray(pts)))(
        jnp.asarray(gt_masks)
    )
    cost = jax.vmap(
        lambda pb, pp, tc, tp, tm: matcher_cost(
            pb, pp, tc, tp, tm, num_points=k, **W
        )
    )(prob, pred_pts, jnp.asarray(gt_cls), gt_pts, jnp.asarray(gt_ok))
    assign = np.asarray(hungarian_match(cost, jnp.asarray(gt_ok)))

    for i in range(b):
        g = int(gt_ok[i].sum())
        c_ref, _, _ = _ref_cost(
            ref, logits[i], masks[i], gt_cls[i, :g], gt_masks[i, :g], pts
        )
        np.testing.assert_allclose(
            np.asarray(cost[i])[:, :g], c_ref, rtol=2e-4, atol=2e-4
        )
        rows, cols = linear_sum_assignment(c_ref)
        want = np.full(gt_ok.shape[1], -1)
        want[cols] = rows
        np.testing.assert_array_equal(assign[i, :g], want[:g])


def test_loss_labels_parity(ref):
    from efg_tpu.models.mask2former import classification_loss

    rs = np.random.RandomState(2)
    logits, masks, gt_cls, gt_masks, gt_ok, pts = _rand_problem(rs)
    b, q, c1 = logits.shape
    g_max = gt_ok.shape[1]
    # a fixed plausible assignment: GT j -> query 2j (fits q=8, g<=5? no —
    # use j+1 to stay in range)
    assign = np.where(gt_ok, np.minimum(np.arange(g_max)[None] + 1, q - 1), -1)

    crit = ref.cr.SetCriterion(
        num_classes=c1 - 1,
        matcher=None,
        weight_dict={},
        eos_coef=0.1,
        losses=["labels"],
        num_points=pts.shape[0],
        oversample_ratio=3.0,
        importance_sample_ratio=0.75,
    )
    indices = []
    for i in range(b):
        t = np.flatnonzero(gt_ok[i])
        s = assign[i, t]
        order = np.argsort(s)
        indices.append(
            (torch.from_numpy(s[order]), torch.from_numpy(t[order]))
        )
    targets = [
        {"labels": torch.from_numpy(gt_cls[i, gt_ok[i]])} for i in range(b)
    ]
    want = crit.loss_labels(
        {"pred_logits": torch.from_numpy(logits)}, targets, indices, None
    )["loss_ce"].item()

    got = float(
        classification_loss(
            jnp.asarray(logits), jnp.asarray(assign), jnp.asarray(gt_ok),
            jnp.asarray(gt_cls.astype(np.int32)),
            num_classes=c1 - 1, no_obj=0.1,
        )
    )
    assert abs(got - want) < 1e-5


def test_loss_masks_parity(ref):
    """Full loss_masks path under identical random draws: patch torch.rand
    inside the reference criterion; pass the same draws to the jax side via
    the cand/rand_points overrides."""
    from efg_tpu.models.mask2former import (
        _sample_points, point_mask_losses, uncertainty_point_coords,
    )

    rs = np.random.RandomState(3)
    logits, masks, gt_cls, gt_masks, gt_ok, _ = _rand_problem(rs)
    b, q = logits.shape[:2]
    g_max = gt_ok.shape[1]
    num_points, over, imp = 16, 3.0, 0.75
    n_over = int(num_points * over)
    n_rand = num_points - int(num_points * imp)
    assign = np.where(gt_ok, np.minimum(np.arange(g_max)[None] + 1, q - 1), -1)

    n_matched = int(gt_ok.sum())
    cand = rs.rand(n_matched, n_over, 2).astype(np.float32)
    rnd = rs.rand(n_matched, n_rand, 2).astype(np.float32)

    # reference side: indices sorted by src query; build the matched-pair
    # ordering so pair p of the draw maps to the same (b, gt) on both sides
    indices, order_pairs = [], []
    for i in range(b):
        t = np.flatnonzero(gt_ok[i])
        s = assign[i, t]
        order = np.argsort(s)
        indices.append((torch.from_numpy(s[order]), torch.from_numpy(t[order])))
        order_pairs += [(i, int(tt)) for tt in t[order]]

    draws = [torch.from_numpy(cand), torch.from_numpy(rnd)]

    def fake_rand(*shape, device=None, dtype=None):
        d = draws.pop(0)
        assert tuple(d.shape) == tuple(shape), (d.shape, shape)
        return d

    real_rand = torch.rand
    torch.rand = fake_rand
    try:
        crit = ref.cr.SetCriterion(
            num_classes=logits.shape[-1] - 1, matcher=None, weight_dict={},
            eos_coef=0.1, losses=["masks"], num_points=num_points,
            oversample_ratio=over, importance_sample_ratio=imp,
        )
        targets = [
            {
                "labels": torch.from_numpy(gt_cls[i, gt_ok[i]]),
                "masks": torch.from_numpy(gt_masks[i, gt_ok[i]]),
            }
            for i in range(b)
        ]
        num_masks = float(n_matched)
        want = crit.loss_masks(
            {"pred_masks": torch.from_numpy(masks)}, targets, indices, num_masks
        )
        want_bce = want["loss_mask"].item()
        want_dice = want["loss_dice"].item()
    finally:
        torch.rand = real_rand

    # jax side on the same matched-pair ordering
    src = np.stack([masks[i, assign[i, t]] for i, t in order_pairs])
    tgt = np.stack([gt_masks[i, t] for i, t in order_pairs])
    coords = uncertainty_point_coords(
        jax.random.key(0), jnp.asarray(src), num_points=num_points,
        oversample_ratio=over, importance_sample_ratio=imp,
        cand=jnp.asarray(cand), rand_points=jnp.asarray(rnd),
    )
    mp = jax.vmap(_sample_points)(jnp.asarray(src), coords)[None]
    gt_p = jax.vmap(_sample_points)(jnp.asarray(tgt), coords)[None]
    ok = jnp.ones((1, n_matched), bool)
    got_bce, got_dice = point_mask_losses(
        mp, gt_p, ok, num_points=num_points, num_boxes=num_masks
    )
    assert abs(float(got_bce) - want_bce) < 1e-4
    assert abs(float(got_dice) - want_dice) < 1e-4
