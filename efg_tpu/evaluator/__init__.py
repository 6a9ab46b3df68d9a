from efg_tpu.evaluator.build import build_evaluators
from efg_tpu.evaluator.evaluator import DatasetEvaluator, DatasetEvaluators
from efg_tpu.evaluator.registry import EVALUATORS

# trigger registrations
from efg_tpu.evaluator import waymo_evaluator as _waymo  # noqa: F401
from efg_tpu.evaluator import coco_evaluator as _cocoev  # noqa: F401
from efg_tpu.evaluator import nuscenes_evaluator as _nuscev  # noqa: F401
from efg_tpu.evaluator import panoptic_evaluator as _panev  # noqa: F401
from efg_tpu.evaluator import tracking_evaluator as _trkev  # noqa: F401

__all__ = ["EVALUATORS", "build_evaluators", "DatasetEvaluator", "DatasetEvaluators"]
