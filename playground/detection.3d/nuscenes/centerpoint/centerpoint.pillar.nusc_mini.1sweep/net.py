"""CenterPoint-Pillar experiment builder."""

from efg_tpu.engine.train_state import ModelDef
from efg_tpu.models import centerpoint as CP


def build_model(config):
    m = config.model
    cfg = dict(
        pc_range=tuple(config.dataset.pc_range),
        voxel_size=tuple(config.dataset.voxel_size),
        tasks=[dict(t) for t in m.head.tasks],
        common_heads=tuple((k, tuple(v)) for k, v in m.head.common_heads.items()),
        loss=dict(m.loss),
    )
    module = CP.PillarNet(
        pc_range=cfg["pc_range"],
        voxel_size=cfg["voxel_size"],
        max_pillars=int(m.max_pillars),
        num_input_features=int(m.reader.num_input_features),
        pfn_filters=tuple(m.reader.pfn_filters),
        tasks=tuple(cfg["tasks"]),
        common_heads=cfg["common_heads"],
        neck_cfg=tuple((k, tuple(v) if isinstance(v, list) else v) for k, v in m.neck.items()),
    )

    def apply_args(batch):
        return dict(points=batch["points"], points_mask=batch["points_mask"])

    def loss_fn(preds, batch):
        return CP.compute_loss(preds, batch, model_cfg=cfg)

    def predict_fn(preds, batch):
        return CP.predict(preds, post_cfg=dict(m.post_process), model_cfg=cfg)

    return ModelDef(module, apply_args, loss_fn, predict_fn)
