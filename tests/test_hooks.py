"""Trainer hook behavior (host-side, no real trainer needed)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from efg_tpu.engine import hooks as H
from efg_tpu.utils.events import EventStorage


class _FakeTrainer:
    def __init__(self):
        self.iter = 0
        self.start_iter = 0
        self.max_iters = 10
        self.mesh = None
        self.dataset = None
        self.dataloader = None
        self._data_iter = None


def test_profiler_hook_writes_trace(tmp_path):
    t = _FakeTrainer()
    hook = H.ProfilerHook(str(tmp_path), start_iter=2, num_iters=2)
    hook.trainer = t
    with EventStorage(0):
        for it in range(5):
            t.iter = it
            hook.before_step()
            if it in (2, 3):
                assert hook._active
            jax.block_until_ready(jax.numpy.ones(8) * it)  # something to trace
            hook.after_step()
        hook.after_train()
    assert not hook._active
    prof_dir = tmp_path / "profile"
    assert prof_dir.is_dir()
    # xplane protos land under plugins/profile/<run>/
    files = [p for p in prof_dir.rglob("*") if p.is_file()]
    assert files, "profiler trace produced no files"


def test_profiler_hook_idempotent_stop(tmp_path):
    t = _FakeTrainer()
    hook = H.ProfilerHook(str(tmp_path), start_iter=0, num_iters=1)
    hook.trainer = t
    hook.before_step()
    hook.after_step()
    hook.after_train()  # second stop must be a no-op
    assert not hook._active


class _FadeDataset:
    def __init__(self):
        self.transforms = ["gt_sampler", "flip"]


def test_augfade_resets_prefetcher():
    from efg_tpu.data.prefetcher import DevicePrefetcher

    t = _FakeTrainer()
    t.dataset = _FadeDataset()
    batches = [{"x": np.zeros((2, 3), np.float32)} for _ in range(4)]
    t.dataloader = batches
    t._data_iter = DevicePrefetcher(iter(batches))
    hook = H.AugFadeHook(fade=0.5, max_iters=10)
    hook.trainer = t

    t.iter = 4
    hook.before_step()
    assert t.dataset.transforms == ["gt_sampler", "flip"]  # not yet

    t.iter = 5
    hook.before_step()
    assert t.dataset.transforms == ["flip"]
    assert isinstance(t._data_iter, DevicePrefetcher)  # still device-fed
    assert isinstance(next(t._data_iter)["x"], jax.Array)

    t.iter = 6  # fires once only
    hook.before_step()
    assert t.dataset.transforms == ["flip"]
