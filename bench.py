"""Benchmark: CenterPoint VoxelNet training throughput on one TPU chip.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...}. The
PRIMARY measurement (CenterPoint bs=2, warm-cache config) is printed and
flushed IMMEDIATELY after it completes; optional upgrades (bs=4, the
ConQueR secondary metric) run afterwards under a wall-clock budget
(`BENCH_TIME_BUDGET`, seconds) and each print a fresh SUPERSET line —
so whichever line is last, the primary metric is present and a mid-run
hang can never erase an already-taken measurement.

The measured number is training frames/sec/chip at Waymo scale (160k-point
clouds, 120k voxel cap, 0.1×0.1×0.15 voxels over ±75.2 m, full
SpMiddleResNetFHD + RPN + CenterHead, forward+backward+adamw). The
reference publishes no throughput (BASELINE.md); `A100_REF_FPS` below is
the documented estimate of the reference's per-A100 training throughput
used as the comparison point, and the BASELINE.json target is ≥2× that.
vs_baseline = measured_fps / A100_REF_FPS (so the target is ≥2.0).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

# Estimated reference training throughput per A100 (CenterPoint Waymo,
# spconv + torch, bs6/GPU). The reference publishes no throughput
# (BASELINE.md). Corroboration from public reproductions of the same
# architecture (SpMiddleResNetFHD + RPN + CenterHead, 0.1m voxels):
#   - mmdetection3d model zoo: CenterPoint-voxel01 nuScenes trains at
#     ~0.4 s/iter for bs 4 x 8 V100 (32 frames / 0.4 s = 80 f/s on 8
#     V100s = 10 f/s per V100); Waymo frames are ~2x the points but A100
#     is ~2x a V100 on spconv workloads -> ~10-15 f/s per A100.
#   - OpenPCDet CenterPoint Waymo configs report ~11-14 h for 30 epochs
#     of 20% data on 8 A100s (~158k frames x 30 / 8 / 12 h ~= 17 f/s per
#     A100).
# 20 f/s per A100 is therefore the GENEROUS end of the plausible range;
# vs_baseline >= 2.0 means >= 2x that. The JSON also reports absolute
# s/step and achieved model TFLOP/s so progress is measurable
# independently of this constant.
A100_REF_FPS = 20.0

_T_START = time.monotonic()
# Wall-clock budget for OPTIONAL upgrades after the primary metric is
# banked. The driver's bench timeout killed round 3 mid-compile; keep the
# default comfortably below any plausible external timeout.
TIME_BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", "2100"))

# Committed carry-forward record of the last successful FULL-SCALE hardware
# measurement. main() prints it (marked "stale": true) as its VERY FIRST
# act — before importing jax — so a dead tunnel / cold-cache compile
# timeout can never again produce an empty BENCH artifact (rounds 3 and 4
# both rc=124 with zero output). A fresh full-scale measurement overwrites
# the in-stream record and rewrites this file.
BANK_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_last_banked.json")


def _remaining() -> float:
    return TIME_BUDGET - (time.monotonic() - _T_START)


def _emit(fps: float, extras: dict) -> dict:
    """Print ONE full JSON line (primary metric + extras) and flush."""
    rec = {
        "metric": "centerpoint_waymo_train_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_REF_FPS, 3),
        **extras,
    }
    print(json.dumps(rec), flush=True)
    return rec


def _bank(rec: dict) -> None:
    """Persist a fresh full-scale measurement as the carry-forward record."""
    try:
        with open(BANK_PATH, "w") as f:
            json.dump({k: v for k, v in rec.items() if k != "stale"}, f)
            f.write("\n")
    except OSError:
        pass


def _load_banked() -> dict | None:
    try:
        with open(BANK_PATH) as f:
            rec = json.load(f)
        return rec if isinstance(rec, dict) and "value" in rec else None
    except Exception:
        return None


def bench_conquer(n_iters: int = 12):
    """ConQueR train-step throughput at Waymo scale (BASELINE.json names
    this metric explicitly): 120k-voxel sparse ResNet-18 + box-attention
    encoder ×3 + decoder ×3, Q=1000, CDN (dn=3) + Hungarian matcher +
    momentum GT decoder + query contrast, forward+backward+adamw, bs=2."""
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from efg_tpu.engine.train_state import TrainState
    from efg_tpu.models import conquer as CQ

    bsz = 2
    detr_kwargs = dict(
        pc_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=120000,
        resnet_caps=(80000, 60000, 30000, 15000),
        depth=18,
        out_features=("res2", "res3", "res4"),
        fpn_levels=("p3",),
        hidden_dim=256,
        num_head=8,
        enc_layers=3,
        dec_layers=3,
        dim_feedforward=1024,
        num_queries=1000,
        num_classes=3,
    )
    model_cfg = dict(
        pc_range=detr_kwargs["pc_range"], voxel_size=detr_kwargs["voxel_size"],
        loss_weights={"class": 1.0, "bbox": 4.0, "giou": 2.0, "rad": 4.0},
        dn=dict(enabled=True, dn_number=3, dn_box_noise_scale=0.4,
                dn_label_noise_ratio=0.5),
        contrastive=dict(mom=0.999, dim=256, eqco=1000, tau=0.7, loss_coeff=0.2),
    )
    mdef = CQ.make_model_def(detr_kwargs, model_cfg)
    batch = ge._batch(160000, bsz=bsz, pc=70.0)

    variables = mdef.module.init(
        jax.random.key(0), batch["points"][:1], batch["points_mask"][:1], True
    )
    tx = optax.flatten(optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-3)))
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=mdef.ema_init(params) if mdef.ema_init else None,
    )

    def step_fn(state, batch):
        rng = jax.random.fold_in(jax.random.key(0), state.step)

        def loss_fn(params):
            loss, losses, new_bs = mdef.custom_loss(
                mdef.module, params, state.batch_stats, state.ema_params,
                batch, rng,
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = mdef.ema_update(state.ema_params, params) if mdef.ema_update else None
        return (
            TrainState(step=state.step + 1, params=params, batch_stats=new_bs,
                       opt_state=new_opt, ema_params=ema),
            loss,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_n(state, batch):
        def body(s, _):
            s, loss = step_fn(s, batch)
            return s, loss

        state, losses = jax.lax.scan(body, state, None, length=n_iters)
        return state, losses[-1]

    state, loss = run_n(state, batch)
    _ = float(loss)
    t0 = time.perf_counter()
    state, loss = run_n(state, batch)
    _ = float(loss)
    dt = time.perf_counter() - t0
    return bsz * n_iters / dt, dt / n_iters


def supervisor():
    """Default entry: a thin parent that NEVER imports jax. It streams the
    measurement child's stdout, remembers the best record seen, enforces
    its own wall-clock deadline, and guarantees the LAST line it prints is
    a parseable JSON record — even when the driver's timeout SIGTERMs us
    mid-compile (rounds 3+4 died exactly there: the only tail content was
    a platform warning, because the main process was stuck inside an XLA
    compile where a Python signal handler never runs; a pure-Python parent
    blocked in readline() handles the signal immediately)."""
    import signal
    import subprocess

    best = _load_banked()
    if best is not None:
        best = {**best, "stale": True}  # honest until a live line lands
        print(json.dumps(best), flush=True)

    final_emitted = False

    def finish(rc: int = 0):
        nonlocal final_emitted
        if not final_emitted:
            final_emitted = True
            if best is not None:
                print(json.dumps(best), flush=True)
            else:
                print(json.dumps({"metric": "centerpoint_waymo_train_frames_per_sec_per_chip",
                                  "value": None, "unit": "frames/s",
                                  "vs_baseline": None,
                                  "note": "no measurement completed"}), flush=True)
        os._exit(rc)

    child = None

    def on_term(signum, frame):
        if child is not None and child.poll() is None:
            try:
                child.kill()
            except OSError:
                pass
        finish(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    deadline = _T_START + TIME_BUDGET
    env = dict(os.environ, BENCH_INPROC="1")
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )

    import threading

    def watchdog():
        remain = deadline - time.monotonic()
        if remain > 0:
            time.sleep(remain)
        if child.poll() is None:
            child.kill()

    threading.Thread(target=watchdog, daemon=True).start()

    assert child.stdout is not None
    for line in child.stdout:
        line = line.strip()
        if not line:
            continue
        print(line, flush=True)
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and rec.get("value") and not rec.get("stale"):
            best = rec
    child.wait()
    finish(0)


def main():
    # --- STEP 0 (before ANY jax import, so a dead tunnel can't block it):
    # print the committed carry-forward record, marked stale. Whatever
    # happens after this line, the bench artifact is non-empty. (When run
    # under supervisor(), the parent already printed it; BENCH_INPROC
    # children skip the stale print to avoid clobbering fresher lines.)
    bs_env = os.environ.get("BENCH_BS")
    is_child = bool(bs_env or os.environ.get("BENCH_CHILD"))
    banked = None if is_child else _load_banked()
    if banked is not None and not os.environ.get("BENCH_INPROC"):
        print(json.dumps({**banked, "stale": True}), flush=True)

    import jax

    # persistent compile cache: the full-scale step takes minutes to build
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import __graft_entry__ as ge

    import jax.numpy as jnp
    import optax

    from efg_tpu.engine.train_state import TrainState
    from efg_tpu.models import centerpoint as CP

    # NOTE: on the tunneled single-chip setup, `block_until_ready` does not
    # actually synchronize (measured: it reports impossible TFLOP/s), and
    # each dispatch pays a large network roundtrip. So: run N steps inside
    # ONE jitted lax.scan and force a scalar value fetch — one roundtrip,
    # honest amortized per-step time. The roundtrip costs ~26 ms per scan
    # call (measured); at n=10 that biased per-step time +2.6 ms, so n=30.
    n_iters = int(os.environ.get("BENCH_ITERS", "30"))

    def measure(model, model_cfg, n_points, bsz, pc=70.0):
        """Init + compile + warm + time the train step for the given model.
        Returns (fps, sec_per_step, model_flops_per_step)."""
        batch1 = ge._batch(n_points, bsz=1, pc=pc)
        variables = model.init(
            jax.random.key(0), batch1["points"], batch1["points_mask"], True
        )
        # keep the reference copy on HOST: the timed runs donate their
        # state, and rebuilding a fresh state from already-donated device
        # buffers is a runtime INVALID_ARGUMENT on the axon backend
        variables = jax.tree.map(np.asarray, variables)
        tx = optax.flatten(
            optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(3e-3))
        )

        def step_fn(state, batch):
            def loss_fn(params):
                preds, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["points"], batch["points_mask"], True,
                    mutable=["batch_stats"],
                )
                losses = CP.compute_loss(preds, batch, model_cfg=model_cfg)
                return losses["loss"], mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=params,
                           batch_stats=new_bs, opt_state=new_opt),
                loss,
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_n(state, batch):
            def body(s, _):
                s, loss = step_fn(s, batch)
                return s, loss

            state, losses = jax.lax.scan(body, state, None, length=n_iters)
            return state, losses[-1]

        params = jax.tree.map(jnp.asarray, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=jax.tree.map(jnp.asarray, variables.get("batch_stats", {})),
            opt_state=tx.init(params),
        )
        batch = ge._batch(n_points, bsz=bsz, pc=pc)
        compiled = run_n.lower(state, batch).compile()
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            model_flops = float(cost.get("flops", 0.0)) / n_iters
        except Exception:
            model_flops = 0.0
        state, loss = compiled(state, batch)
        _ = float(loss)
        t0 = time.perf_counter()
        state, loss = compiled(state, batch)
        _ = float(loss)  # device->host fetch = real sync
        dt = time.perf_counter() - t0
        return bsz * n_iters / dt, dt / n_iters, model_flops

    # --- STEP 1: reduced-scale LIVE bank (compiles in tens of seconds even
    # cold) — proves the chip + software stack work TODAY before the
    # multi-minute full-scale compile starts.
    if not is_child:
        try:
            r_model, r_cfg, r_np = ge._flagship(bench_scale=False)
            rfps, rsps, _ = measure(r_model, r_cfg, r_np, bsz=2, pc=18.0)
            if banked is not None:
                print(json.dumps({**banked, "stale": True,
                                  "reduced_scale_fps_live": round(rfps, 3)}),
                      flush=True)
            else:
                _emit(rfps, {"scale": "reduced",
                             "sec_per_step_bs2": round(rsps, 4),
                             "batch_size": 2})
        except Exception as e:  # keep going: full scale may still work
            print(json.dumps({"note": "reduced-scale leg failed",
                              "error": repr(e)[:200]}), flush=True)

    # --- STEP 2 PRIMARY: full scale, bs=2 (the config every prior round
    # has cached). Bank it in-stream AND to the carry-forward file.
    model, model_cfg, n_points = ge._flagship(bench_scale=True)
    primary_bs = int(bs_env) if bs_env else 2
    fps, sec_per_step, model_flops = measure(model, model_cfg, n_points, primary_bs)
    extras = {
        f"sec_per_step_bs{primary_bs}": round(sec_per_step, 4),
        "batch_size": primary_bs,
    }
    if model_flops:
        extras.update(
            model_tflops_per_step=round(model_flops / 1e12, 3),
            achieved_tflops_per_sec=round(model_flops / sec_per_step / 1e12, 2),
        )
    rec = _emit(fps, extras)
    if not is_child:
        _bank(rec)

    # --- UPGRADES, each in an ISOLATED SUBPROCESS: a crash, hang, or
    # backend-poisoning error in one leg cannot disturb the banked primary
    # or the other legs. Children share the persistent compile cache.
    def run_child(mode, budget):
        import subprocess
        import sys

        env = dict(os.environ, BENCH_CHILD=mode)
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, timeout=budget, env=env,
            )
            for line in reversed(res.stdout.strip().splitlines()):
                try:
                    return json.loads(line)
                except Exception:
                    continue
            return {"error": (res.stderr or res.stdout)[-200:] or f"rc={res.returncode}"}
        except subprocess.TimeoutExpired:
            return {"error": f"timeout after {budget:.0f}s"}

    # bs=4 amortizes per-step fixed costs (dispatch, structure builds) over
    # more frames — the reference trains bs=6/GPU
    if not bs_env and _remaining() > 300:
        r = run_child("bs4", _remaining() - 60)
        if "error" in r:
            extras["bs4_error"] = r["error"]
        else:
            extras["sec_per_step_bs4"] = r["sec_per_step"]
            extras["bs4_achieved_tflops_per_sec"] = r.get("achieved_tflops_per_sec", 0.0)
            if r["fps"] > fps:
                fps = r["fps"]
                extras["batch_size"] = 4
        rec = _emit(fps, extras)
        _bank(rec)

    # ConQueR secondary metric (BASELINE.json names it). If this leg can't
    # run or fails, carry forward the last banked ConQueR measurement
    # (marked stale) instead of dropping the field — a timeout here once
    # erased a good number from the carry-forward record.
    def carry_conquer():
        if banked and "conquer_frames_per_sec_per_chip" in banked:
            extras["conquer_frames_per_sec_per_chip"] = banked[
                "conquer_frames_per_sec_per_chip"]
            extras["conquer_sec_per_step_bs2"] = banked.get(
                "conquer_sec_per_step_bs2")
            extras["conquer_stale"] = True

    if not os.environ.get("BENCH_CHILD"):
        if _remaining() > 300:
            r = run_child("conquer", _remaining() - 60)
            if "error" in r:
                extras["conquer_error"] = r["error"]
                carry_conquer()
            else:
                extras["conquer_frames_per_sec_per_chip"] = r["fps"]
                extras["conquer_sec_per_step_bs2"] = r["sec_per_step"]
        else:
            carry_conquer()
        rec = _emit(fps, extras)
        _bank(rec)


def child_main(mode: str):
    """Isolated upgrade leg: prints one small JSON line for the parent."""
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if mode == "conquer":
        fps, sps = bench_conquer()
        print(json.dumps({"fps": round(fps, 3), "sec_per_step": round(sps, 4)}),
              flush=True)
        return
    assert mode == "bs4"
    os.environ["BENCH_BS"] = "4"
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main()
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    print(json.dumps({
        "fps": rec["value"],
        "sec_per_step": rec["sec_per_step_bs4"],
        "achieved_tflops_per_sec": rec.get("achieved_tflops_per_sec", 0.0),
    }), flush=True)


if __name__ == "__main__":
    child = os.environ.get("BENCH_CHILD")
    if child:
        child_main(child)
    elif os.environ.get("BENCH_INPROC"):
        main()
    else:
        supervisor()
