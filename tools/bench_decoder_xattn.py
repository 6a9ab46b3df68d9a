"""Micro-bench the decoder cross-attention runs-gather path (fwd+bwd) at
exact ConQueR Waymo decoder shapes (p3 map 188×188, radius 8, L=1000
matching + 1536 CDN queries, bs=2).

The r4 device trace attributed ~330 ms/step to this op's fwd+bwd chain
(gather whiles + contraction relayouts/broadcasts + dV scatter); this tool
times one layer's fwd+grad in isolation so kernel variants can be A/B'd
without the 12-minute full-step compile.

Usage: python tools/bench_decoder_xattn.py [n_iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from efg_tpu.ops import box_attention as BA

B, L, NH, C, H, W, R = 2, 2536, 8, 256, 188, 188, 8
N = int(sys.argv[1]) if len(sys.argv) > 1 else 12


def main():
    rs = np.random.RandomState(0)
    value = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32) * 0.1)
    base = jnp.asarray(
        np.stack([rs.randint(0, H, (B, L)), rs.randint(0, W, (B, L))], -1),
        jnp.int32,
    )
    s2 = (2 * R + 1) ** 2
    coeffs = jax.nn.softmax(
        jnp.asarray(rs.randn(B, L, NH, s2).astype(np.float32)), -1
    )

    def loss(v, a):
        o = BA.box_attention_window_gather(
            v, a, base, num_heads=NH, radius=R, chunk=512, runs=True
        )
        return (o.astype(jnp.float32) ** 2).sum()

    def n_steps(v, a):
        def body(carry, _):
            val, cf, acc = carry
            l, (gv, ga) = jax.value_and_grad(loss, argnums=(0, 1))(val, cf)
            # anti-CSE: evolve both inputs so XLA cannot hoist the body
            return (val + 1e-6 * gv, cf + 1e-6 * ga, acc + l), ()

        (v2, a2, acc), _ = jax.lax.scan(body, (v, a, 0.0), None, length=N)
        return acc

    t0 = time.monotonic()
    c = jax.jit(n_steps).lower(value, coeffs).compile()
    print(f"compile: {time.monotonic() - t0:.1f}s", flush=True)
    ma = c.memory_analysis()
    if ma is not None:
        print(f"peak temp: {ma.temp_size_in_bytes / 1e6:.0f} MB", flush=True)
    _ = float(c(value, coeffs))  # warm + sync
    t0 = time.perf_counter()
    _ = float(c(value, coeffs))
    dt = (time.perf_counter() - t0) / N
    print(f"fwd+bwd: {dt * 1e3:.2f} ms/layer (N={N})", flush=True)


if __name__ == "__main__":
    main()
