"""End-to-end training regression gates (VERDICT r3 item 5).

`tools/make_goldens.py` trains each synthetic playground experiment for
100-200 iterations on the 8-device CPU mesh and records the loss curve
under tests/goldens/. These tests (a) sanity-check the committed goldens
actually converged, and (b) replay a short prefix of the same run (same
seed, same surface) and assert the produced loss records match the golden
within a tolerance band — failing if the train step, data pipeline RNG,
loss, or optimizer drift.

The replay runs in a subprocess with JAX_PLATFORMS=cpu and 8 forced host
devices so it is independent of the pytest process's JAX state.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")

# name -> replay iteration count (compile time dominates; keep short).
# The flagship replay always runs; the others are opt-in (EFG_RUN_E2E=1)
# to keep the default suite affordable on the 1-core CPU surface.
REPLAY = {
    "centerpoint_synth": 12,
    "conquer_synth": 12,
    "mask2former_synth": 12,
}
OPT_IN = {"conquer_synth", "mask2former_synth"}


def _goldens():
    if not os.path.isdir(GOLDEN_DIR):
        return []
    return sorted(f[:-5] for f in os.listdir(GOLDEN_DIR) if f.endswith(".json"))


def _load(name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", _goldens() or ["missing"])
def test_golden_converged(name):
    if name == "missing":
        pytest.skip("no goldens generated yet (tools/make_goldens.py)")
    g = _load(name)
    losses = np.asarray(g["losses"], np.float64)
    assert len(losses) >= 5, "golden too short to be a regression gate"
    assert np.isfinite(losses).all(), "golden contains non-finite losses"
    # training must have made real progress: mean of the last quarter well
    # below the first record
    tail = losses[-max(1, len(losses) // 4):].mean()
    assert tail < losses[0] * 0.8, (
        f"golden {name} shows no convergence: first={losses[0]:.3f} "
        f"tail-mean={tail:.3f}"
    )


@pytest.mark.parametrize("name", sorted(REPLAY))
def test_golden_replay_prefix(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.json")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated yet (tools/make_goldens.py)")
    if os.environ.get("EFG_SKIP_E2E"):
        pytest.skip("EFG_SKIP_E2E set")
    if name in OPT_IN and not os.environ.get("EFG_RUN_E2E"):
        pytest.skip(f"{name} replay is opt-in (set EFG_RUN_E2E=1)")
    g = _load(name)
    n_replay = REPLAY[name]
    exp_dir = os.path.join(REPO, g["experiment"])

    cache = f"/tmp/golden_replay/{name}"
    subprocess.run(["rm", "-rf", cache], check=True)
    os.makedirs(cache, exist_ok=True)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO,
        EFG_PATH=os.path.join(REPO, "efg_tpu"),
        EFG_CACHE_DIR=cache,
    )
    overrides = [
        o for o in g["overrides"] if not o.startswith("solver.lr_scheduler.max_iters")
    ] + [f"solver.lr_scheduler.max_iters={n_replay}"]
    cmd = [sys.executable, "-m", "cli.main", "--config", "config.yaml",
           "task=train", *overrides]
    subprocess.run(cmd, cwd=exp_dir, env=env, check=True, timeout=3600,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    metrics = []
    for root, _, files in os.walk(cache):
        metrics += [os.path.join(root, f) for f in files if f == "metrics.json"]
    assert len(metrics) == 1, metrics
    got = {}
    with open(metrics[0]) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                got[int(rec["iteration"])] = float(rec["loss"])
    assert got, "replay produced no loss records"

    want = dict(zip(g["iters"], g["losses"]))
    common = sorted(set(got) & set(want))
    assert common, f"no overlapping iterations: got {sorted(got)} vs golden {g['iters'][:5]}..."
    for it in common:
        assert np.isfinite(got[it])
        rel = abs(got[it] - want[it]) / max(abs(want[it]), 1e-6)
        assert rel < 5e-2, (
            f"{name} iter {it}: loss {got[it]:.5f} drifted from golden "
            f"{want[it]:.5f} (rel {rel:.3f})"
        )
