"""Device-trace build_monotone_rule9 alone and print per-op times.

NOTE on an earlier misreading this script exists to prevent: timing the
builder inside a lax.scan over CONSTANT inputs lets XLA CSE the body, so
the "per-iter" time is total/N (bogus — it once read ~0.7 ms for the
merge custom-call). With the key-perturbation below feeding fresh inputs
each iteration, the honest figure is ~8.6 ms/call for the merge
custom-call at Waymo s0 shapes (see docs/PARITY.md round-4 notes).
"""

from __future__ import annotations

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 50


def main():
    from efg_tpu.modeling.readers.voxel_reader import dynamic_mean_vfe
    from efg_tpu.ops import sparse as S
    from efg_tpu.ops.pallas import sparse_kernels as PK

    import __graft_entry__ as ge

    PC = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    VOX = (0.1, 0.1, 0.15)
    batch = ge._batch(160000, bsz=2, pc=70.0)
    grid = tuple(int(round((PC[i + 3] - PC[i]) / VOX[i])) for i in range(3))
    sshape = (grid[2] + 1, grid[1], grid[0])

    feats, coords, valid = jax.jit(
        lambda p, m: dynamic_mean_vfe(p, m, pc_range=PC, voxel_size=VOX,
                                      max_voxels=120000, num_input_features=5)
    )(batch["points"], batch["points_mask"])
    st = jax.jit(lambda f, c, v: S.from_batched_voxels(f, c, v, sshape))(
        feats, coords, valid
    )

    @jax.jit
    def run(f, s):
        def body(c, _):
            # anti-CSE: bump keys by a carry-dependent 0 (runtime zero, not
            # foldable) — with constant keys XLA hoists the whole build out
            # of the scan and the per-iter numbers are total/N (bogus)
            bump = (c > jnp.float32(1e30)).astype(jnp.int32)
            packed = PK.build_monotone_rule9(s.replace(keys=s.keys + bump), 3)
            return c + jnp.sum(jnp.abs(packed).astype(jnp.float32)) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=N)
        return c

    _ = float(run(st.features, st))
    trace_dir = "/tmp/trace_rule9"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    _ = float(run(st.features, st))
    wall = (time.perf_counter() - t0) / N
    jax.profiler.stop_trace()
    print(f"wall: {wall * 1e3:.3f} ms/iter", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
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
                for stt in ev.stats:
                    if stat_meta.get(stt.metadata_id) == "device_duration_ps":
                        dur = stt.uint64_value or stt.int64_value
                if dur is None:
                    dur = ev.duration_ps
                per_op[meta.get(ev.metadata_id, "?")] += dur / 1e12
        if not per_op:
            continue
        total = sum(per_op.values())
        print(f"\n== plane {plane.name}: total {total / N * 1e3:.2f} ms/iter ==")
        for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {t / N * 1e3:9.3f}  {name[:160]}")


if __name__ == "__main__":
    main()
