"""Learning-rate (and momentum) schedules as optax schedule functions.

Rebuild of `efg/solver/lr_schedulers.py`: OneCycle (torch `OneCycleLR`
semantics incl. cosine momentum cycling), WarmupMultiStep, and
LinearWarmupCosineAnnealing — all pure step→value functions usable inside
the jitted update.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp

from efg_tpu.utils.registry import Registry

LR_SCHEDULERS = Registry("lr_schedulers")

Schedule = Callable


def warmup_factor_at(method: str, it, warmup_iters: int, warmup_factor: float):
    """Reference `_get_warmup_factor_at_iter` (`lr_schedulers.py:12-36`)."""
    it = jnp.asarray(it, jnp.float32)
    if method == "constant":
        f = jnp.full_like(it, warmup_factor)
    elif method == "linear":
        alpha = it / warmup_iters
        f = warmup_factor * (1 - alpha) + alpha
    elif method == "burnin":
        f = (it / warmup_iters) ** 4
    else:
        raise ValueError(f"Unknown warmup method: {method}")
    return jnp.where(it >= warmup_iters, 1.0, f)


def _cos_anneal(start, end, pct):
    return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)


@LR_SCHEDULERS.register(name="OneCycle")
def one_cycle(
    *,
    lr: float,
    max_iters: int,
    pct_start: float = 0.4,
    div_factor: float = 10.0,
    final_div_factor: float = 1e4,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
    **_,
):
    """torch `OneCycleLR` cosine strategy (reference wraps it,
    `lr_schedulers.py:222-238`). Returns (lr_schedule, momentum_schedule)."""
    initial_lr = lr / div_factor
    min_lr = initial_lr / final_div_factor
    up = max(1, int(pct_start * max_iters) - 1)
    down = max(1, max_iters - up - 1)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / up, 0, 1)
        pct_down = jnp.clip((step - up) / down, 0, 1)
        return jnp.where(
            step <= up,
            _cos_anneal(initial_lr, lr, pct_up),
            _cos_anneal(lr, min_lr, pct_down),
        )

    def mom_fn(step):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / up, 0, 1)
        pct_down = jnp.clip((step - up) / down, 0, 1)
        return jnp.where(
            step <= up,
            _cos_anneal(max_momentum, base_momentum, pct_up),
            _cos_anneal(base_momentum, max_momentum, pct_down),
        )

    return lr_fn, mom_fn


@LR_SCHEDULERS.register(name="WarmupMultiStep")
def warmup_multi_step(
    *,
    lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 0.001,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
    **_,
):
    """Reference `WarmupMultiStepLR` (`lr_schedulers.py:39-85`)."""
    milestones = list(milestones)
    assert milestones == sorted(milestones)
    ms = jnp.asarray(milestones, jnp.float32)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        wf = warmup_factor_at(warmup_method, step, warmup_iters, warmup_factor)
        n_passed = (step[..., None] >= ms).sum(axis=-1) if ms.size else 0
        return lr * wf * gamma ** n_passed

    return lr_fn, None


@LR_SCHEDULERS.register(name="LinearWarmupCosineAnnealing")
def linear_warmup_cosine(
    *,
    lr: float,
    max_iters: int,
    warmup_iters: int = 1000,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
    **_,
):
    """Reference `LinearWarmupCosineAnnealingLR` (`lr_schedulers.py:86-221`)."""

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (lr - warmup_start_lr) * jnp.clip(
            step / max(warmup_iters, 1), 0, 1
        )
        pct = jnp.clip((step - warmup_iters) / max(max_iters - warmup_iters, 1), 0, 1)
        cos = eta_min + (lr - eta_min) * (1 + jnp.cos(jnp.pi * pct)) / 2
        return jnp.where(step < warmup_iters, warm, cos)

    return lr_fn, None


def build_scheduler(cfg) -> tuple:
    """cfg = config.solver.lr_scheduler (+ .optimizer.lr merged by caller).
    Returns (lr_schedule, momentum_schedule | None)."""
    kind = cfg["type"]
    kwargs = {k: v for k, v in dict(cfg).items() if k != "type"}
    return LR_SCHEDULERS.get(kind)(**kwargs)
