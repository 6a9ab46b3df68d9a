from efg_tpu.engine.registry import HOOKS, TRAINERS
from efg_tpu.engine.train_state import ModelDef, TrainState


def build_trainer(config, build_model):
    from efg_tpu.engine.trainer import build_trainer as _bt

    return _bt(config, build_model)


__all__ = ["TRAINERS", "HOOKS", "ModelDef", "TrainState", "build_trainer"]
