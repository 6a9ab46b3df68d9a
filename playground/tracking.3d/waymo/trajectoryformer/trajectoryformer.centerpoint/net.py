"""TrajectoryFormer synthetic tracking experiment."""

from efg_tpu.engine.train_state import ModelDef
from efg_tpu.models import trajectoryformer as TF


def build_model(config):
    mc = config.model.trajectoryformer
    module = TF.TrajectoryFormerDet(
        d_model=int(mc.d_model), num_layers=int(mc.num_layers),
        num_points=int(mc.num_points), history=int(mc.history),
    )

    def apply_args(batch):
        return dict(
            points=batch["points"], points_mask=batch["points_mask"],
            det_boxes=batch["det_boxes"], det_mask=batch["det_mask"],
        )

    def loss_fn(preds, batch):
        return TF.det_compute_loss(preds, batch)

    def predict_fn(preds, batch):
        return TF.det_predict(preds, batch)

    init_params = None
    motion_ckpt = config.model.get("motion_model", "")
    if motion_ckpt:
        # graft the pretrained motion encoder (reference
        # `dataset.motion_model` in trajectoryformer.centerpoint)
        init_params = lambda p: TF.load_motion_encoder(p, motion_ckpt)

    return ModelDef(module, apply_args, loss_fn, predict_fn,
                    init_params=init_params)
