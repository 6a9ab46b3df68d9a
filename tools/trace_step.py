"""Device-trace the full CenterPoint train step and aggregate per-op time.

Recipe (CLAUDE.md): jax.profiler.start_trace around a compiled call, then
parse the xplane proto directly — plane `/device:TPU:0`, line `XLA Ops`,
stat `device_duration_ps` per event (event spans double-count async waits).

Usage: python tools/trace_step.py [n_top] [--bs N]
Writes the grouped table to stdout.
"""

from __future__ import annotations

import functools
import glob
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 30  # match bench.py n_iters so the persistent compile cache is shared


def build_step(bs=2):
    import optax

    import __graft_entry__ as ge
    from efg_tpu.engine.train_state import TrainState
    from efg_tpu.models import centerpoint as CP

    model, model_cfg, n_points = ge._flagship(bench_scale=True)
    batch = ge._batch(n_points, bsz=bs, pc=70.0)
    variables = model.init(jax.random.key(0), batch["points"][:1], batch["points_mask"][:1], True)
    tx = optax.flatten(optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(3e-3)))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )

    def step_fn(state, batch):
        def loss_fn(params):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
            )
            losses = CP.compute_loss(preds, batch, model_cfg=model_cfg)
            return losses["loss"], mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, batch_stats=new_bs, opt_state=new_opt),
            loss,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_n(state, batch):
        def body(s, _):
            s, loss = step_fn(s, batch)
            return s, loss

        state, losses = jax.lax.scan(body, state, None, length=N)
        return state, losses[-1]

    return run_n, state, batch


CATEGORIES = [
    ("pallas_fused", re.compile(r"fused_gather|strided_conv|custom-call|pallas", re.I)),
    ("gather", re.compile(r"gather", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("sort", re.compile(r"sort", re.I)),
    ("conv", re.compile(r"conv", re.I)),
    ("dot", re.compile(r"dot|matmul", re.I)),
    ("cummax/scan", re.compile(r"cum|reduce-window", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
]


def categorize(name):
    for cat, pat in CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


# Budget lines for the PARITY.md table (VERDICT r4 item 2): where does a
# full train step's device time sit, in framework terms. The outer N-step
# bench scan is listed separately (its event SPANS every inner op, so it
# would double-count if merged into a line).
BUDGET = [
    ("outer-scan/while", re.compile(r"^%while")),
    ("rulebook merges (rank kernel)", re.compile(r"merge_rank_flags|_rank_kernel", re.I)),
    ("gather-GEMMs (subm fwd/dW)", re.compile(r"fused_gather_gemm|fused_gather_dw|subm", re.I)),
    ("strided conv kernels", re.compile(r"strided_conv", re.I)),
    ("dense RPN/head convs", re.compile(r"convolution|%conv", re.I)),
    ("voxelize sort/unique", re.compile(r"sort|cummax|reduce-window", re.I)),
    ("copies/transposes", re.compile(r"copy|transpose|bitcast", re.I)),
    ("fusions (elementwise/loss/opt)", re.compile(r"fusion", re.I)),
]


def budgetize(name):
    for cat, pat in BUDGET:
        if pat.search(name):
            return cat
    return "other (scatter/gather/glue)"


def main():
    n_top = 40
    bs = 2
    args = sys.argv[1:]
    if "--bs" in args:
        i = args.index("--bs")
        bs = int(args[i + 1])
        del args[i : i + 2]
    if args:
        n_top = int(args[0])

    run_n, state, batch = build_step(bs)
    t0 = time.perf_counter()
    state, loss = run_n(state, batch)
    _ = float(loss)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    trace_dir = "/tmp/trace_step"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    state, loss = run_n(state, batch)
    _ = float(loss)
    wall = (time.perf_counter() - t0) / N
    jax.profiler.stop_trace()
    print(f"wall: {wall * 1e3:.1f} ms/iter (bs={bs} → {bs / wall:.2f} f/s)", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, "no xplane written"
    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name or "#" in plane.name:
            continue
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        stat_meta = {mid: m.name for mid, m in plane.stat_metadata.items()}
        per_op = defaultdict(float)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = None
                for st in ev.stats:
                    if stat_meta.get(st.metadata_id) == "device_duration_ps":
                        dur = st.uint64_value or st.int64_value
                if dur is None:
                    dur = ev.duration_ps
                per_op[meta.get(ev.metadata_id, "?")] += dur / 1e12
        if not per_op:
            continue
        total = sum(per_op.values())
        print(f"\n== plane {plane.name}: device total {total / N * 1e3:.1f} ms/iter ==")
        cats = defaultdict(float)
        for name, t in per_op.items():
            cats[categorize(name)] += t
        print("\n-- by category (ms/iter) --")
        for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:20s} {t / N * 1e3:9.2f}")
        buckets = defaultdict(float)
        for name, t in per_op.items():
            buckets[budgetize(name)] += t
        print("\n-- budget table (ms/iter) --")
        for cat, t in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:34s} {t / N * 1e3:9.2f}")
        print(f"\n-- top {n_top} ops (ms/iter) --")
        for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:n_top]:
            print(f"  {t / N * 1e3:9.3f}  {name[:130]}")


if __name__ == "__main__":
    main()
