"""Data registries (reference `efg/data/registry.py:1-5`)."""

from efg_tpu.utils.registry import Registry

DATASETS = Registry("datasets")
SAMPLERS = Registry("samplers")
PROCESSORS = Registry("processors")
