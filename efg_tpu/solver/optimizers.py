"""Optimizers (optax) with the reference's registry/builder contract.

Rebuild of `efg/solver/optimizers.py`, `adafactor.py`, `lars_sgd.py`:
Adam/AdamW/SGD (with the D2-style norm/bias weight-decay exemption),
Adafactor, LARS. Schedules are injected so lr (and β1 for OneCycle
momentum cycling) can vary per step inside the jitted update.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import optax

from efg_tpu.utils.registry import Registry

OPTIMIZERS = Registry("optimizers")


def _norm_bias_mask(params) -> Any:
    """True = apply weight decay. Excludes biases and norm scales, the
    D2_SGD param-group behavior (`efg/solver/optimizers.py:42-70`)."""
    import jax

    def keep(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_norm_or_bias = any(
            n in ("bias", "scale", "mean", "var") or "bn" in str(n).lower() for n in names
        )
        return not is_norm_or_bias and jnp.ndim(leaf) > 1

    return jax.tree_util.tree_map_with_path(keep, params)


@OPTIMIZERS.register(name="AdamW")
def adamw(
    *,
    lr_schedule: Callable,
    momentum_schedule: Optional[Callable] = None,
    weight_decay: float = 0.01,
    betas=(0.9, 0.99),
    eps: float = 1e-8,
    **_,
):
    if momentum_schedule is not None:
        # OneCycle-style β1 cycling via injected hyperparams
        @optax.inject_hyperparams
        def make(learning_rate, b1):
            return optax.adamw(
                learning_rate, b1=b1, b2=betas[1], eps=eps, weight_decay=weight_decay
            )

        return make(learning_rate=lr_schedule, b1=momentum_schedule)
    return optax.adamw(
        lr_schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )


@OPTIMIZERS.register(name="Adam")
def adam(*, lr_schedule, momentum_schedule=None, betas=(0.9, 0.999), eps=1e-8, **_):
    return optax.adam(lr_schedule, b1=betas[0], b2=betas[1], eps=eps)


@OPTIMIZERS.register(name="SGD")
@OPTIMIZERS.register(name="D2_SGD")
def d2_sgd(
    *,
    lr_schedule,
    momentum_schedule=None,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    nesterov: bool = False,
    params=None,
    **_,
):
    wd = optax.masked(
        optax.add_decayed_weights(weight_decay), _norm_bias_mask
    )
    return optax.chain(
        wd,
        optax.sgd(lr_schedule, momentum=momentum, nesterov=nesterov),
    )


@OPTIMIZERS.register(name="AdamWMulti")
def adamw_multi(
    *,
    lr_schedule: Callable,
    momentum_schedule: Optional[Callable] = None,
    weight_decay: float = 0.01,
    betas=(0.9, 0.99),
    eps: float = 1e-9,
    lr_multipliers: Optional[dict] = None,
    **_,
):
    """AdamW with per-submodule learning-rate multipliers (reference
    `AdamWMulti`, `playground/detection.3d/waymo/conquer/.../modules/
    optimizer.py`): `lr_multipliers` maps top-level param-path substrings
    (e.g. "backbone") to a factor on the base schedule."""
    mults = dict(lr_multipliers or {})

    def scale_for(path) -> float:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        joined = "/".join(names)
        for key, m in mults.items():
            if key in joined:
                return float(m)
        return 1.0

    def label_fn(params):
        import jax

        return jax.tree_util.tree_map_with_path(
            lambda path, _: f"m{scale_for(path)}", params
        )

    def make(mult: float):
        return optax.adamw(
            lambda step: lr_schedule(step) * mult,
            b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay,
        )

    all_mults = sorted({1.0, *(float(v) for v in mults.values())})
    transforms = {f"m{m}": make(m) for m in all_mults}
    return optax.multi_transform(transforms, label_fn)


@OPTIMIZERS.register(name="Adafactor")
def adafactor(*, lr_schedule, momentum_schedule=None, weight_decay: float = 0.0, **_):
    return optax.adafactor(lr_schedule, weight_decay_rate=weight_decay or None)


@OPTIMIZERS.register(name="LARS_SGD")
def lars_sgd(*, lr_schedule, momentum_schedule=None, momentum=0.9, weight_decay=1e-4,
             trust_coefficient=0.001, **_):
    return optax.lars(
        lr_schedule, weight_decay=weight_decay,
        trust_coefficient=trust_coefficient, momentum=momentum,
    )


def build_optimizer(cfg, lr_schedule, momentum_schedule=None, *, grad_clip_cfg=None,
                    allow_flatten=True):
    """cfg = config.solver.optimizer; optional grad clipping prepended
    (reference `Optimization` hook clip, `efg/engine/hooks.py:17-22,68-81`)."""
    kind = cfg["type"]
    kwargs = {k: v for k, v in dict(cfg).items() if k not in ("type", "lr")}
    tx = OPTIMIZERS.get(kind)(
        lr_schedule=lr_schedule, momentum_schedule=momentum_schedule, **kwargs
    )
    if grad_clip_cfg and grad_clip_cfg.get("enabled", False):
        clip_type = grad_clip_cfg.get("clip_type", "norm")
        p = grad_clip_cfg.get("params", {})
        if clip_type == "norm":
            clip = optax.clip_by_global_norm(float(p.get("max_norm", 10.0)))
        elif clip_type == "value":
            clip = optax.clip(float(p.get("clip_value", 1.0)))
        else:
            raise ValueError(f"Unknown clip_type {clip_type}")
        tx = optax.chain(clip, tx)
    if kind in ("AdamW", "Adam") and allow_flatten:
        # flatten per-leaf updates into ONE fused vector op: ~200 tiny
        # per-parameter fusions (clip norms + adamw moments) cost ~10 ms
        # per step on TPU (device trace); tree-structured transforms
        # (multi_transform / masked) cannot flatten. Disabled under tensor
        # parallelism: a single flat vector cannot carry per-parameter
        # shardings, so the moments would be replicated + re-gathered.
        tx = optax.flatten(tx)
    return tx
