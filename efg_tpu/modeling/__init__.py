from efg_tpu.modeling.registry import BACKBONES, HEADS, LAYERS, LOSSES, READERS


def _register_defaults():
    """Populate the registries with the built-in components (decorators at
    definition sites would force eager imports of every backbone; lazy bulk
    registration keeps import time low)."""
    from efg_tpu.modeling.backbones.fpn import FPN
    from efg_tpu.modeling.backbones.resnet import ResNet
    from efg_tpu.modeling.backbones.rpn import RPN, RPNFixBNMom
    from efg_tpu.modeling.backbones.sparse_net import SpMiddleResNetFHD
    from efg_tpu.modeling.backbones.sparse_resnet import SparseResNet
    from efg_tpu.modeling.backbones.swin import SwinTransformer
    from efg_tpu.modeling.heads.center_head import CenterHead, SepHead
    from efg_tpu.modeling.heads.multigroup_head import MultiGroupHead
    from efg_tpu.modeling.losses import (
        giou_loss_2d,
        iou_loss_2d,
        rotated_giou_3d_loss,
        sigmoid_focal_loss,
        sigmoid_focal_loss_star,
        smooth_l1_loss,
    )
    from efg_tpu.modeling.readers.voxel_reader import PillarFeatureNet, dynamic_mean_vfe

    for b in (SpMiddleResNetFHD, SparseResNet, RPN, RPNFixBNMom, ResNet, FPN, SwinTransformer):
        if b.__name__ not in BACKBONES:
            BACKBONES.register(b)
    for h in (CenterHead, SepHead, MultiGroupHead):
        if h.__name__ not in HEADS:
            HEADS.register(h)
    for name, fn in [
        ("sigmoid_focal_loss", sigmoid_focal_loss),
        ("sigmoid_focal_loss_star", sigmoid_focal_loss_star),
        ("smooth_l1_loss", smooth_l1_loss),
        ("iou_loss_2d", iou_loss_2d),
        ("giou_loss_2d", giou_loss_2d),
        ("rotated_giou_3d_loss", rotated_giou_3d_loss),
    ]:
        if name not in LOSSES:
            LOSSES.register(fn, name=name)
    if "PillarFeatureNet" not in READERS:
        READERS.register(PillarFeatureNet)
        READERS.register(dynamic_mean_vfe, name="DynamicMeanVFE")


__all__ = ["BACKBONES", "READERS", "HEADS", "LOSSES", "LAYERS", "_register_defaults"]
