"""Trainer hooks (host-side callbacks around the jitted step).

Rebuild of `efg/engine/hooks.py:44-293`. One deliberate difference: the
reference's `Optimization` hook (backward + optimizer step in `after_step`)
doesn't exist here — gradient computation, clipping, and the optimizer
update are compiled INTO the jitted train step (`trainer.py`), which is the
TPU-correct factoring. The remaining hooks (timing, writers, checkpoint,
LR logging, eval) stay host-side.
"""

from __future__ import annotations

import time
import weakref
from typing import List, Optional

from efg_tpu.utils.events import EventWriter, get_event_storage
from efg_tpu.utils.timer import Timer


class HookBase:
    trainer = None  # weakref proxy, set by the trainer

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class IterTimer(HookBase):
    """Warmup-aware per-iteration timing (reference `hooks.py:124-174`)."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._step_timer = Timer()
        self._start_time = time.perf_counter()
        self._total_timer = Timer()

    def before_train(self):
        self._start_time = time.perf_counter()
        self._total_timer.reset()
        self._total_timer.pause()

    def after_train(self):
        storage = get_event_storage()
        total_time = time.perf_counter() - self._start_time
        total_compute = self._total_timer.seconds()
        num_iter = storage.iter - self.trainer.start_iter - self._warmup_iter
        if num_iter > 0 and total_compute > 0:
            import logging

            logging.getLogger("efg_tpu").info(
                f"Total training time: {total_time:.1f}s; "
                f"{total_compute / num_iter:.4f} s/it over {num_iter} iters"
            )

    def before_step(self):
        self._step_timer.reset()
        self._total_timer.resume()

    def after_step(self):
        storage = get_event_storage()
        if storage.iter - self.trainer.start_iter >= self._warmup_iter:
            storage.put_scalar("time", self._step_timer.seconds(), smoothing_hint=True)
        else:
            self._start_time = time.perf_counter()
            self._total_timer.reset()
        self._total_timer.pause()


class LRSchedulerHook(HookBase):
    """Log the scheduled LR each step (reference `hooks.py:84-121`; the
    schedule itself is evaluated inside the jitted update)."""

    def __init__(self, lr_schedule):
        self._lr_schedule = lr_schedule

    def after_step(self):
        storage = get_event_storage()
        lr = float(self._lr_schedule(storage.iter))
        storage.put_scalar("lr", lr, smoothing_hint=False)


class PeriodicWriter(HookBase):
    """Flush writers every `period` iterations (reference `hooks.py:177-206`)."""

    def __init__(self, writers: List[EventWriter], period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        storage = get_event_storage()
        if (storage.iter + 1) % self._period == 0 or (
            storage.iter == self.trainer.max_iters - 1
        ):
            for w in self._writers:
                w.write()

    def after_train(self):
        for w in self._writers:
            w.write()
            w.close()


class PeriodicCheckpoint(HookBase):
    """Save every `period` iterations + `model_final`
    (reference `hooks.py:209-239`)."""

    def __init__(self, period: int):
        self._period = max(1, int(period))

    def after_step(self):
        it = get_event_storage().iter
        if (it + 1) % self._period == 0 and it != self.trainer.max_iters - 1:
            # async: overlaps the file write with the next train steps;
            # train() waits for in-flight writes before returning
            self.trainer.save_checkpoint(f"model_{it:07d}", blocking=False)

    def after_train(self):
        # a preempted run is NOT final: it already saved a step checkpoint,
        # and writing model_final here would make the resumed run look done
        if getattr(self.trainer, "_preempted", False):
            return
        self.trainer.save_checkpoint("model_final", blocking=False)


class EvalHook(HookBase):
    """Periodic evaluation (reference `hooks.py:242-293`)."""

    def __init__(self, period: int, eval_fn):
        self._period = int(period)
        self._eval_fn = eval_fn

    def after_step(self):
        it = get_event_storage().iter
        if self._period > 0 and (it + 1) % self._period == 0 and it != self.trainer.max_iters - 1:
            self._eval_fn()

    def after_train(self):
        pass


class AugFadeHook(HookBase):
    """Drop the leading data processor (GT-database sampling) for the last
    `fade` fraction of training — the reference ConQueR `CustomTrainer`
    behavior (`conquer/.../env.py:7-25`)."""

    def __init__(self, fade: float, max_iters: int):
        self._fade_start = int(max_iters * (1.0 - fade))
        self._faded = False

    def before_step(self):
        t = self.trainer
        if not self._faded and t.iter >= self._fade_start:
            ds = t.dataset
            if getattr(ds, "transforms", None):
                from efg_tpu.data.prefetcher import DevicePrefetcher

                ds.transforms = ds.transforms[1:]
                t._data_iter = DevicePrefetcher(iter(t.dataloader), mesh=t.mesh)
            self._faded = True
            import logging

            logging.getLogger("efg_tpu").info(
                f"Aug fade at iter {t.iter}: dropped leading processor"
            )


class ProfilerHook(HookBase):
    """Capture a `jax.profiler` trace over iterations
    [`start_iter`, `start_iter + num_iters`) into `<out_dir>/profile`
    (viewable in TensorBoard/xprof). Fills the reference's tracing gap
    (SURVEY §aux: it had no profiler integration; this is the TPU-native
    equivalent of a torch.profiler/nsight hook)."""

    def __init__(self, out_dir: str, start_iter: int = 10, num_iters: int = 5):
        import os

        self._dir = os.path.join(out_dir, "profile")
        self._start = int(start_iter)
        self._stop = int(start_iter) + max(1, int(num_iters))
        self._active = False

    def before_step(self):
        if not self._active and self.trainer.iter == self._start:
            import jax

            jax.profiler.start_trace(self._dir)
            self._active = True

    def _finish(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            import logging

            logging.getLogger("efg_tpu").info(f"Profiler trace written to {self._dir}")

    def after_step(self):
        if self._active and self.trainer.iter + 1 >= self._stop:
            self._finish()

    def after_train(self):
        self._finish()


def attach(trainer, hooks: List[Optional[HookBase]]) -> List[HookBase]:
    hooks = [h for h in hooks if h is not None]
    for h in hooks:
        h.trainer = weakref.proxy(trainer)
    return hooks
