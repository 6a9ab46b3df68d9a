from efg_tpu.data.structures.boxes import (
    Boxes,
    BoxMode,
    RotatedBoxes,
    pairwise_iou,
    pairwise_iou_rotated,
)
from efg_tpu.data.structures.instances import Instances
from efg_tpu.data.structures.masks import BitMasks, PolygonMasks, polygons_to_bitmask

__all__ = [
    "Boxes", "BoxMode", "RotatedBoxes", "pairwise_iou", "pairwise_iou_rotated",
    "Instances", "BitMasks", "PolygonMasks", "polygons_to_bitmask",
]
