"""A/B sweep of the env-gated sparse-kernel variants on the live TPU
(VERDICT r3 item 2). Runs bench.py's primary bs=2 CenterPoint leg in a
subprocess per variant (the flags are read at import time) and prints a
before/after table. Variants share the persistent compile cache, so a
repeated winner re-measures warm.

Usage: python tools/ab_sweep.py [variant ...]
  variant names: base seq4 g3 tile512 tile2048 (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "base": {},
    "seq4": {"EFG_RANK_IMPL": "seq4"},
    "g3": {"EFG_SPARSE_G3": "1"},
    "tile512": {"EFG_SPARSE_TILE": "512"},
    "tile2048": {"EFG_SPARSE_TILE": "2048"},
}


def run_variant(name: str, extra_env: dict) -> dict:
    env = dict(
        os.environ,
        BENCH_BS="2",            # primary leg only
        BENCH_TIME_BUDGET="0",   # no upgrade legs
        # PREPEND to PYTHONPATH — clobbering it drops /root/.axon_site,
        # where the axon TPU PJRT plugin lives (r4: all legs failed with
        # "Unable to initialize backend 'axon'")
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        **extra_env,
    )
    t0 = time.monotonic()
    try:
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=2400, env=env, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"error": "timeout 2400s"}
    wall = time.monotonic() - t0
    for line in reversed(res.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            rec["wall_s"] = round(wall, 1)
            return rec
        except Exception:
            continue
    return {"error": (res.stderr or res.stdout)[-300:], "wall_s": round(wall, 1)}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        print(f"[{name}] env={VARIANTS[name]} ...", flush=True)
        rec = run_variant(name, VARIANTS[name])
        results[name] = rec
        if "error" in rec:
            print(f"[{name}] ERROR: {rec['error']}", flush=True)
        else:
            print(
                f"[{name}] {rec['value']} f/s  "
                f"{rec.get('sec_per_step_bs2', '?')} s/step  "
                f"(wall {rec['wall_s']}s)",
                flush=True,
            )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
