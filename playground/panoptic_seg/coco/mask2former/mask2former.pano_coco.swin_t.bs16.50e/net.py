"""Mask2Former COCO-panoptic experiment builder (ResNet or Swin trunk)."""

import jax

from efg_tpu.engine.train_state import ModelDef
from efg_tpu.models import mask2former as M2F


def _hashable(v):
    if isinstance(v, dict) or hasattr(v, "items"):
        return tuple((k, _hashable(x)) for k, x in v.items())
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    return v


def build_model(config):
    mc = config.model.mask2former
    cfg = {k: v for k, v in dict(mc).items()}
    module = M2F.Mask2Former(
        num_classes=int(mc.num_classes), num_queries=int(mc.num_queries),
        d_model=int(mc.d_model), dec_layers=int(mc.dec_layers),
        depth=int(mc.depth), freeze_at=int(mc.freeze_at),
        backbone=str(mc.get("backbone", "resnet")),
        swin_cfg=_hashable(mc.get("swin_cfg", {}) or {}),
    )

    def apply_args(batch):
        return dict(images=batch["images"])

    def loss_fn(preds, batch, rng=None):
        # the trainer threads its per-step rng in; fall back for direct calls
        if rng is None:
            rng = jax.random.key(0)
        return M2F.compute_loss(preds, batch, model_cfg=cfg, rng=rng)

    def predict_fn(preds, batch):
        # combined instance + panoptic outputs: the COCO evaluator consumes
        # masks/scores/labels, the panoptic evaluator the pan_* fields
        out = M2F.predict_instance(preds, model_cfg=cfg)
        out.update(M2F.predict_panoptic(preds, model_cfg=cfg))
        return out

    return ModelDef(module, apply_args, loss_fn, predict_fn)
