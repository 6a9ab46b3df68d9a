"""Solver: optimizers + LR schedulers (reference `efg/solver/__init__.py:6-19`)."""

from efg_tpu.solver.optimizers import OPTIMIZERS, build_optimizer
from efg_tpu.solver.schedulers import LR_SCHEDULERS, build_scheduler

__all__ = ["OPTIMIZERS", "LR_SCHEDULERS", "build_optimizer", "build_scheduler"]
