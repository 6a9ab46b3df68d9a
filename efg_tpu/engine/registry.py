"""Engine registries (reference `efg/engine/registry.py:1-4`)."""

from efg_tpu.utils.registry import Registry

TRAINERS = Registry("trainers")
HOOKS = Registry("hooks")
