"""Checkpoint-resume continuity (VERDICT r4 item 6).

Trains synthetic CenterPoint for 10 iters (run A), then 5 iters + save
(run B), then resumes in a fresh process to 10 (run C), and asserts run
C's iter 5-9 losses equal run A's bit-for-bit. This is exact because

- the step RNG is folded from ``state.step`` (restored with the state),
- the loader derives augmentation RNG per item ORDINAL and fast-forwards
  by discarding sampler indices (`DataLoader.start_batch`), so the
  post-resume data stream is bit-identical to the uninterrupted run's,
- parameters/optimizer moments/BN stats ride the orbax checkpoint.

Matches the reference resume semantics (`efg/engine/trainer.py:211-245`)
but stronger: the reference restarts its dataloader stream on resume.

Runs in subprocesses (own JAX_PLATFORMS=cpu, 2-device mesh) like
tests/test_e2e_goldens.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(
    REPO, "playground/detection.3d/synthetic/centerpoint.synth.voxelnet"
)


def _run(cache: str, max_iters: int, resume: bool,
         extra: list[str] = ()) -> dict[int, float]:
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO,
        EFG_PATH=os.path.join(REPO, "efg_tpu"),
        EFG_CACHE_DIR=cache,
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_cpu_tests",
    )
    cmd = [
        sys.executable, "-m", "cli.main", "--config", "config.yaml",
        *(["--resume"] if resume else []),
        "task=train",
        f"solver.lr_scheduler.max_iters={max_iters}",
        "trainer.log_interval=1", "trainer.window_size=1",
        "trainer.evaluators=null", "trainer.eval_period=null",
        *extra,
    ]
    subprocess.run(cmd, cwd=EXP, env=env, check=True, timeout=1200,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    metrics = []
    for root, _, files in os.walk(cache):
        metrics += [os.path.join(root, f) for f in files if f == "metrics.json"]
    assert len(metrics) == 1, metrics
    out: dict[int, float] = {}
    with open(metrics[0]) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                out[int(rec["iteration"])] = float(rec["loss"])
    return out


def test_dp_resume_loss_continuity(tmp_path):
    if os.environ.get("EFG_SKIP_E2E"):
        pytest.skip("EFG_SKIP_E2E set")
    cache = str(tmp_path / "run")

    # Baseline: ONE uninterrupted 10-iter run, periodic checkpoint after
    # step 5. (The LR schedule is a function of max_iters, so the resumed
    # run must share it — resume, not retrain-shorter.) JSON record at
    # iteration k holds step k-1's loss (metrics are fetched one step
    # late to avoid device syncs); the mapping is identical across runs.
    full = _run(cache, 10, resume=False, extra=["trainer.checkpoint_iter=5"])
    assert sorted(full) == list(range(1, 11)), f"baseline iters: {sorted(full)}"
    assert np.isfinite(list(full.values())).all()

    # keep only the step-5 checkpoint, then resume in a fresh process
    finals = []
    for root, dirs, _ in os.walk(cache):
        finals += [os.path.join(root, d) for d in dirs if d == "model_final"]
    assert finals, "baseline produced no model_final"
    for d in finals:
        subprocess.run(["rm", "-rf", d], check=True)

    resumed = _run(cache, 10, resume=True)  # restores step 5, runs 5..9
    # metrics.json is append-mode: the resumed run must have actually
    # appended fresh records (guard against comparing baseline to itself)
    metrics = []
    for root, _, files in os.walk(cache):
        metrics += [os.path.join(root, f) for f in files if f == "metrics.json"]
    with open(metrics[0]) as f:
        n10 = sum(1 for line in f if json.loads(line).get("iteration") == 10)
    assert n10 == 2, f"expected baseline+resumed records at iter 10, got {n10}"
    post = {it: v for it, v in resumed.items() if it > 5}
    assert sorted(post) == [6, 7, 8, 9, 10], f"resumed iters: {sorted(resumed)}"
    for it in sorted(post):
        assert post[it] == full[it], (
            f"record {it}: resumed loss {post[it]!r} != uninterrupted "
            f"{full[it]!r} (drift {abs(post[it] - full[it]):.3e})"
        )


def test_sigterm_preemption_checkpoint_and_resume(tmp_path):
    """Preemption safety: SIGTERM mid-training saves a step checkpoint,
    exits cleanly (rc=0, no model_final), and a --resume relaunch finishes
    the schedule."""
    import signal
    import subprocess as sp
    import time

    if os.environ.get("EFG_SKIP_E2E"):
        pytest.skip("EFG_SKIP_E2E set")
    cache = str(tmp_path / "run")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO,
        EFG_PATH=os.path.join(REPO, "efg_tpu"),
        EFG_CACHE_DIR=cache,
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_cpu_tests",
    )
    cmd = [
        sys.executable, "-m", "cli.main", "--config", "config.yaml",
        "task=train", "solver.lr_scheduler.max_iters=50",
        "trainer.log_interval=1", "trainer.window_size=1",
        "trainer.evaluators=null", "trainer.eval_period=null",
    ]
    proc = sp.Popen(cmd, cwd=EXP, env=env, stdout=sp.DEVNULL, stderr=sp.DEVNULL)
    try:
        # wait until a few iterations have been recorded, then preempt
        deadline = time.time() + 900
        seen = False
        while time.time() < deadline and not seen:
            for root, _, files in os.walk(cache):
                for f in files:
                    if f == "metrics.json":
                        with open(os.path.join(root, f)) as fh:
                            seen = sum(1 for _ in fh) >= 2
            if proc.poll() is not None:
                raise AssertionError("train exited before it could be preempted")
            time.sleep(2)
        assert seen, "no training iterations observed before deadline"
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, f"preempted run exited rc={rc}"
    ckpts, finals = [], []
    for root, dirs, _ in os.walk(cache):
        ckpts += [d for d in dirs if d.startswith("model_") and d != "model_final"]
        finals += [d for d in dirs if d == "model_final"]
    assert ckpts, "preemption saved no step checkpoint"
    assert not finals, "preempted run must not write model_final"

    # relaunch with --resume: restores the preemption checkpoint and finishes
    resumed = _run(cache, 10, resume=True)
    assert max(resumed) == 10 and np.isfinite(list(resumed.values())).all()
