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


class ModelDef:
    """What an experiment's `build_model(config)` returns.

    module      — flax linen module; called `module.apply(vars,
                  **apply_args(batch), train=..., mutable=...)`
    apply_args  — batch → kwargs for the module call (arrays only)
    loss_fn     — (preds, batch) → dict with key "loss" (+ metrics)
    predict_fn  — (preds, batch) → per-sample fixed-shape detections
    """

    def __init__(
        self,
        module,
        apply_args: Callable[[Dict[str, Any]], Dict[str, Any]],
        loss_fn: Callable,
        predict_fn: Optional[Callable] = None,
    ):
        self.module = module
        self.apply_args = apply_args
        self.loss_fn = loss_fn
        self.predict_fn = predict_fn
