"""Voxel-DETR experiment model builder."""

from efg_tpu.engine.train_state import ModelDef
from efg_tpu.models import voxel_detr as VD


def detr_kwargs(config):
    m = config.model
    return dict(
        pc_range=tuple(config.dataset.pc_range),
        voxel_size=tuple(config.dataset.voxel_size),
        max_voxels=int(m.max_voxels),
        resnet_caps=tuple(m.resnet_caps),
        depth=int(m.sparse_resnet.depth),
        out_features=tuple(m.sparse_resnet.out_features),
        fpn_levels=tuple(m.fpn_levels),
        hidden_dim=int(m.hidden_dim),
        num_head=int(m.transformer.nhead),
        enc_layers=int(m.transformer.enc_layers),
        dec_layers=int(m.transformer.dec_layers),
        dim_feedforward=int(m.transformer.dim_feedforward),
        num_queries=int(m.transformer.num_queries),
        num_classes=len(config.dataset.classes),
    )


def model_cfg(config):
    lw = config.model.loss
    return dict(
        pc_range=tuple(config.dataset.pc_range),
        voxel_size=tuple(config.dataset.voxel_size),
        loss_weights={
            "class": float(lw.class_loss_coef),
            "bbox": float(lw.bbox_loss_coef),
            "giou": float(lw.giou_loss_coef),
            "rad": float(lw.rad_loss_coef),
        },
    )


def build_model(config):
    cfg = model_cfg(config)
    module = VD.VoxelDETR(**detr_kwargs(config))

    def apply_args(batch):
        return dict(points=batch["points"], points_mask=batch["points_mask"])

    def loss_fn(preds, batch):
        return VD.compute_loss(preds, batch, model_cfg=cfg)

    def predict_fn(preds, batch):
        return VD.predict(preds, model_cfg=cfg)

    return ModelDef(module, apply_args, loss_fn, predict_fn)
