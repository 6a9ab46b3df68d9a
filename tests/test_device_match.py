"""Device-side JV matcher vs scipy's exact Hungarian solve."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.ops.matcher import device_match, hungarian_match


def _total_cost(cost, gt_mask, match):
    tot = 0.0
    for b in range(cost.shape[0]):
        for g in range(cost.shape[2]):
            if gt_mask[b, g] and match[b, g] >= 0:
                tot += cost[b, match[b, g], g]
    return tot


def _scipy_cost(cost, gt_mask):
    from scipy.optimize import linear_sum_assignment

    tot = 0.0
    for b in range(cost.shape[0]):
        cols = np.flatnonzero(gt_mask[b])
        if cols.size:
            r, c = linear_sum_assignment(cost[b][:, cols])
            tot += cost[b][r, cols[c]].sum()
    return tot


@pytest.mark.parametrize("q,g,seed", [(64, 7, 0), (128, 30, 1), (16, 16, 2), (6, 4, 3)])
def test_device_match_exact(q, g, seed):
    rs = np.random.RandomState(seed)
    cost = rs.randn(3, q, g).astype(np.float32) * 5.0
    n_valid = rs.randint(1, g + 1, size=3)
    gt_mask = (np.arange(g)[None] < n_valid[:, None])

    match = np.asarray(device_match(jnp.asarray(cost), jnp.asarray(gt_mask)))

    # one-to-one over valid GTs, -1 on padding
    for b in range(3):
        used = match[b][gt_mask[b]]
        assert (used >= 0).all() and (used < q).all()
        assert len(set(used.tolist())) == len(used)
        assert (match[b][~gt_mask[b]] == -1).all()

    ours = _total_cost(cost, gt_mask, match)
    opt = _scipy_cost(cost, gt_mask)
    assert ours == pytest.approx(opt, abs=1e-3)


def test_device_match_empty_and_jit():
    cost = jnp.zeros((2, 8, 4))
    gt_mask = jnp.zeros((2, 4), bool)
    out = jax.jit(device_match)(cost, gt_mask)
    assert (np.asarray(out) == -1).all()


def test_device_match_more_gts_than_queries():
    rs = np.random.RandomState(5)
    cost = jnp.asarray(rs.randn(1, 3, 5).astype(np.float32))
    gt_mask = jnp.ones((1, 5), bool)
    out = np.asarray(device_match(cost, gt_mask))
    assigned = out[0][out[0] >= 0]
    assert len(assigned) == 3  # only Q assignments possible
    assert len(set(assigned.tolist())) == 3


def test_hungarian_backend_switch():
    rs = np.random.RandomState(3)
    cost = jnp.asarray(rs.randn(2, 32, 6).astype(np.float32))
    gt_mask = jnp.ones((2, 6), bool)
    host = np.asarray(hungarian_match(cost, gt_mask, backend="host"))
    dev = np.asarray(hungarian_match(cost, gt_mask, backend="device"))
    c, m = np.asarray(cost), np.ones((2, 6), bool)
    assert _total_cost(c, m, dev) == pytest.approx(_total_cost(c, m, host), abs=1e-3)


def test_device_match_grad_stopped():
    def loss(c):
        m = device_match(c, jnp.ones((1, 3), bool))
        return jnp.sum(c[0, m[0], jnp.arange(3)])

    g = jax.grad(loss)(jnp.asarray(np.random.RandomState(4).randn(1, 8, 3), jnp.float32))
    # gradient flows through the gather, not the assignment decision
    assert np.isfinite(np.asarray(g)).all()
