"""Evaluator registry (reference `efg/evaluator/registry.py`)."""

from efg_tpu.utils.registry import Registry

EVALUATORS = Registry("evaluators")
