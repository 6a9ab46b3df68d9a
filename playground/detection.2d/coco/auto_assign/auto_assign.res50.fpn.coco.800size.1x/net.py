"""AutoAssign synthetic experiment builder."""

from efg_tpu.engine.train_state import ModelDef
from efg_tpu.models import autoassign as AA


def build_model(config):
    mc = config.model.autoassign
    cfg = dict(num_classes=int(mc.num_classes), fpn_strides=list(mc.fpn_strides))
    module = AA.AutoAssign(
        num_classes=cfg["num_classes"], depth=int(mc.depth),
        freeze_at=int(mc.get("freeze_at", 2)),
        fpn_strides=tuple(cfg["fpn_strides"]),
    )

    def apply_args(batch):
        return dict(images=batch["images"])

    def loss_fn(preds, batch):
        return AA.compute_loss(preds, batch, model_cfg=cfg)

    def predict_fn(preds, batch):
        return AA.predict(
            preds, model_cfg=cfg,
            score_threshold=float(mc.get("score_threshold", 0.05)),
            nms_threshold=float(mc.get("nms_threshold", 0.6)),
        )

    return ModelDef(module, apply_args, loss_fn, predict_fn)
