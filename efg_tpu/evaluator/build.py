"""Evaluator builder (reference `efg/evaluator/build.py:9-26`)."""

from __future__ import annotations

from efg_tpu.evaluator.registry import EVALUATORS


def build_evaluators(config, dataset):
    names = list(config.trainer.get("evaluators", []) or [])
    return [EVALUATORS.get(n)(config, dataset) for n in names]
