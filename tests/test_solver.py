"""Solver: schedules + optimizers."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.solver import build_optimizer, build_scheduler


def test_one_cycle_shape():
    lr_fn, mom_fn = build_scheduler(
        dict(type="OneCycle", lr=0.003, max_iters=1000, pct_start=0.4,
             div_factor=10.0, base_momentum=0.85, max_momentum=0.95)
    )
    lrs = np.asarray([float(lr_fn(i)) for i in (0, 200, 399, 600, 999)])
    assert lrs[0] == pytest.approx(0.0003, rel=1e-3)       # lr/div_factor
    assert lrs[2] == pytest.approx(0.003, rel=1e-2)        # peak at pct_start
    assert lrs[-1] < 1e-5                                  # annealed to ~0
    moms = [float(mom_fn(i)) for i in (0, 399, 999)]
    assert moms[0] == pytest.approx(0.95, rel=1e-3)
    assert moms[1] == pytest.approx(0.85, rel=1e-2)
    assert moms[2] == pytest.approx(0.95, rel=1e-2)


def test_warmup_multistep():
    lr_fn, _ = build_scheduler(
        dict(type="WarmupMultiStep", lr=0.01, milestones=[100, 200], gamma=0.1,
             warmup_iters=10, warmup_factor=0.1)
    )
    assert float(lr_fn(0)) == pytest.approx(0.001)
    assert float(lr_fn(10)) == pytest.approx(0.01)
    assert float(lr_fn(150)) == pytest.approx(0.001)
    assert float(lr_fn(250)) == pytest.approx(0.0001)


def test_adamw_multi_lr_multipliers():
    import optax

    tx = build_optimizer(
        dict(type="AdamWMulti", lr=1.0, weight_decay=0.0, eps=1e-9,
             lr_multipliers={"backbone": 0.1}),
        lr_schedule=lambda s: 1.0,
    )
    params = {"backbone": {"w": jnp.ones(4)}, "head": {"w": jnp.ones(4)}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # adam step magnitude ≈ lr for constant grads; backbone 10x smaller
    ub = float(jnp.abs(updates["backbone"]["w"]).mean())
    uh = float(jnp.abs(updates["head"]["w"]).mean())
    assert ub == pytest.approx(uh * 0.1, rel=1e-2)


def test_grad_clipping_applied():
    tx = build_optimizer(
        dict(type="AdamW", lr=1.0, weight_decay=0.0),
        lr_schedule=lambda s: 1.0,
        grad_clip_cfg=dict(enabled=True, clip_type="norm", params=dict(max_norm=1.0)),
    )
    params = {"w": jnp.zeros(4)}
    state = tx.init(params)
    huge = {"w": jnp.full(4, 1e6)}
    updates, _ = tx.update(huge, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
