"""Functional training state + model definition protocol.

The reference's stateful trainer pieces (model/optimizer/scheduler objects,
`efg/engine/trainer.py:132-317`) become one immutable pytree threaded
through a jitted step. `ModelDef` is the contract experiment `net.py`
files return from `build_model(config)` — the TPU analog of the
reference's class-method injection (`cli/main.py:120-121`).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None  # EMA shadow (e.g. ConQueR momentum decoder)


class ModelDef:
    """What an experiment's `build_model(config)` returns.

    module      — flax linen module; called `module.apply(vars,
                  **apply_args(batch), train=..., mutable=...)`
    apply_args  — batch → kwargs for the module call (arrays only)
    loss_fn     — (preds, batch) → dict with key "loss" (+ metrics)
    predict_fn  — (preds, batch) → per-sample fixed-shape detections
    custom_loss — optional full-control training loss:
                  (module, params, batch_stats, ema_params, batch, rng)
                  → (loss, metrics_dict, new_batch_stats); used by models
                  that need extra applies inside the grad computation
                  (e.g. ConQueR's momentum GT decoder)
    ema_init    — params → ema_params (enables the EMA shadow)
    ema_update  — (ema_params, new_params) → ema_params, run after each
                  optimizer step inside the jitted update
    init_params — optional params → params hook run once after module.init
                  (e.g. grafting a pretrained motion encoder — the analog
                  of the reference's `dataset.motion_model` load)
    """

    def __init__(
        self,
        module,
        apply_args: Callable[[Dict[str, Any]], Dict[str, Any]],
        loss_fn: Callable,
        predict_fn: Optional[Callable] = None,
        custom_loss: Optional[Callable] = None,
        ema_init: Optional[Callable] = None,
        ema_update: Optional[Callable] = None,
        init_params: Optional[Callable] = None,
    ):
        self.module = module
        self.apply_args = apply_args
        self.loss_fn = loss_fn
        self.predict_fn = predict_fn
        self.custom_loss = custom_loss
        self.ema_init = ema_init
        self.ema_update = ema_update
        self.init_params = init_params
