"""Device kernels — the `efg._C` CUDA extension equivalents (SURVEY.md §2.4)."""

from efg_tpu.ops import sparse, voxelize, voxelize_np  # noqa: F401
from efg_tpu.ops.box_attention import box_attention_sample, make_box_grids
from efg_tpu.ops.deform_conv import DeformConv, deform_conv2d
from efg_tpu.ops.gaussian import gaussian_radius_jnp, splat_gaussians
from efg_tpu.ops.iou_box3d import box3d_overlap
from efg_tpu.ops.iou_rotated import intersection_area_bev, iou_3d, iou_bev
from efg_tpu.ops.knn import knn_gather, knn_points
from efg_tpu.ops.matcher import hungarian_match
from efg_tpu.ops.ms_deform_attn import ms_deform_attn_sample
from efg_tpu.ops.nms import circle_nms, rotated_nms
from efg_tpu.ops.nms2d import batched_nms, iou_xyxy

__all__ = [
    "sparse", "voxelize", "voxelize_np",
    "box_attention_sample", "make_box_grids", "ms_deform_attn_sample",
    "deform_conv2d", "DeformConv",
    "splat_gaussians", "gaussian_radius_jnp",
    "iou_bev", "iou_3d", "intersection_area_bev", "box3d_overlap",
    "knn_points", "knn_gather", "hungarian_match",
    "rotated_nms", "circle_nms", "batched_nms", "iou_xyxy",
]
