"""Motion-prediction pretrain experiment (reference
trajectoryformer.motionpred): trains the MotionEncoder to predict future
box centers; the tracking experiment grafts the encoder at init."""

from efg_tpu.engine.train_state import ModelDef
from efg_tpu.models import trajectoryformer as TF


def build_model(config):
    mc = config.model.motionpred
    module = TF.MotionPrediction(
        d_model=int(mc.d_model), num_future=int(mc.num_future),
    )

    def apply_args(batch):
        return dict(traj=batch["traj_hist"], traj_mask=batch["traj_mask"])

    def loss_fn(preds, batch):
        return TF.motion_compute_loss(preds, batch)

    def predict_fn(preds, batch):
        return TF.motion_predict(preds, batch)

    return ModelDef(module, apply_args, loss_fn, predict_fn)
