"""Generate end-to-end synthetic training goldens (VERDICT r3 item 5).

Runs each synthetic playground experiment for a few hundred iterations on
the forced 8-device CPU mesh (the same surface the test suite uses),
parses the resulting metrics.json, and commits a compact loss-curve golden
under tests/goldens/<name>.json. `tests/test_e2e_goldens.py` then replays
a short prefix with the same seed and asserts the curve matches within a
tolerance band — a regression gate on the full train step (model fwd/bwd,
loss, optimizer, data pipeline determinism).

Usage:  python tools/make_goldens.py [name ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (golden name, experiment dir, overrides). Shapes are shrunk via dotlist
# overrides so the replay gate in tests/test_e2e_goldens.py stays cheap on
# the 1-core CPU surface; the full-scale configs are exercised elsewhere
# (verify skill / bench).
EXPERIMENTS = {
    "centerpoint_synth": (
        "playground/detection.3d/synthetic/centerpoint.synth.voxelnet",
        [
            "solver.lr_scheduler.max_iters=200",
            "dataloader.batch_size=8",
            "dataset.points_per_frame=2048",
            "dataset.processors.train[5].PadPoints.num_points=2048",
            "model.max_voxels=2048",
            "model.stage_caps=[1536,1024,768,768]",
        ],
    ),
    "conquer_synth": (
        "playground/detection.3d/synthetic/conquer.synth.res18",
        [
            "solver.lr_scheduler.max_iters=120",
            "dataloader.batch_size=8",
            "dataset.points_per_frame=2048",
            "dataset.processors.train[2].PadPoints.num_points=2048",
            "model.max_voxels=2048",
            "model.resnet_caps=[1536,1024,512,256]",
        ],
    ),
    "mask2former_synth": (
        "playground/panoptic_seg/synthetic/mask2former.synth.res50",
        [
            "solver.lr_scheduler.max_iters=120",
            "dataloader.batch_size=8",
            "dataset.image_size=96",
            "dataset.processors.train[1].RasterizeMasks.height=96",
            "dataset.processors.train[1].RasterizeMasks.width=96",
            "dataset.processors.train[2].PadImage.height=96",
            "dataset.processors.train[2].PadImage.width=96",
            "model.mask2former.depth=18",
        ],
    ),
}

COMMON_OVERRIDES = [
    "misc.seed=42",
    "trainer.checkpoint_period=1000000",  # no checkpoints during golden runs
    "trainer.window_size=10",
    "trainer.log_interval=10",
    "trainer.evaluators=",  # skip post-train eval; curve is the artifact
]

ENV = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    "PYTHONPATH": REPO,
    "EFG_PATH": os.path.join(REPO, "efg_tpu"),
}


def run_one(name: str) -> dict:
    exp_rel, overrides = EXPERIMENTS[name]
    exp_dir = os.path.join(REPO, exp_rel)
    cache = f"/tmp/goldens/{name}"
    os.makedirs(cache, exist_ok=True)
    env = dict(os.environ, **ENV, EFG_CACHE_DIR=cache)
    cmd = [sys.executable, "-m", "cli.main", "--config", "config.yaml",
           "task=train", *COMMON_OVERRIDES, *overrides]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, cwd=exp_dir, env=env, check=True, timeout=7200)

    metrics_files = []
    for root, _, files in os.walk(cache):
        metrics_files += [os.path.join(root, f) for f in files if f == "metrics.json"]
    assert len(metrics_files) == 1, metrics_files
    iters, losses = [], []
    with open(metrics_files[0]) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                iters.append(int(rec["iteration"]))
                losses.append(float(rec["loss"]))
    return {
        "experiment": exp_rel,
        "overrides": COMMON_OVERRIDES + overrides,
        "seed": 42,
        "platform": "cpu8",
        "iters": iters,
        "losses": losses,
    }


def main():
    names = sys.argv[1:] or list(EXPERIMENTS)
    out_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        golden = run_one(name)
        path = os.path.join(out_dir, f"{name}.json")
        with open(path, "w") as f:
            json.dump(golden, f, indent=1)
        n = len(golden["losses"])
        print(f"[{name}] wrote {path}: {n} records, "
              f"loss {golden['losses'][0]:.3f} -> {golden['losses'][-1]:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
