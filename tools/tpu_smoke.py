"""Hardware-mode Pallas kernel smoke (VERDICT r3 item 7).

Runs the Mosaic-lowered sparse kernels on the REAL TPU at tiny shapes and
checks them against the XLA gather-GEMM oracle — catching Mosaic-only
lowering/semantics breakage that the interpret-mode suite can't see,
without paying the full bench. Exits nonzero on any failure.

Usage: python tools/tpu_smoke.py      (~1-2 min incl. compile on a warm cache)
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

from efg_tpu.ops import sparse as S
from efg_tpu.ops.pallas import sparse_kernels as PK

FAILED = []


def check(name, got, want, rtol=3e-2, atol=3e-2):
    got, want = np.asarray(got), np.asarray(want)
    ok = np.allclose(got, want, rtol=rtol, atol=atol)
    mx = float(np.abs(got - want).max()) if got.size else 0.0
    print(f"{'PASS' if ok else 'FAIL'}  {name:44s} max|Δ|={mx:.2e}", flush=True)
    if not ok:
        FAILED.append(name)


def check_norm(name, got, want, tol=3e-2):
    """Norm-relative check for big bf16 accumulations (dW over 1000+ rows):
    max|Δ| bounded by tol · max|want|."""
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    denom = max(float(np.abs(want).max()), 1e-9)
    rel = float(np.abs(got - want).max()) / denom
    ok = rel < tol
    print(f"{'PASS' if ok else 'FAIL'}  {name:44s} rel|Δ|={rel:.2e}", flush=True)
    if not ok:
        FAILED.append(name)


def make_sparse(seed, n, cap, c, shape=(12, 48, 48)):
    rs = np.random.RandomState(seed)
    D, H, W = shape
    # unique sites, sorted linear keys (the voxelizer's emission order)
    lin = rs.choice(D * H * W, size=n, replace=False)
    lin.sort()
    z, rem = lin // (H * W), lin % (H * W)
    y, x = rem // W, rem % W
    coords = np.zeros((1, cap, 3), np.int32)
    coords[0, :n] = np.stack([z, y, x], axis=1)
    feats = np.zeros((1, cap, c), np.float32)
    feats[0, :n] = rs.randn(n, c).astype(np.float32)
    valid = np.zeros((1, cap), bool)
    valid[0, :n] = True
    return S.from_batched_voxels(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid), shape
    )


def main():
    if os.environ.get("EFG_SMOKE_CPU"):  # script-logic debugging only
        PK.set_interpret(True)
    else:
        assert jax.default_backend() != "cpu", (
            "tpu_smoke must run on the real TPU (JAX_PLATFORMS unset)"
        )
    t0 = time.time()
    rs = np.random.RandomState(7)

    # --- SubM fused gather-GEMM fwd + VJP, two channel regimes ------------
    for cin, cout, tag in ((16, 16, "subm16"), (64, 64, "subm64")):
        st = make_sparse(1, 1500, 2048, cin)
        w = jnp.asarray(rs.randn(27, cin, cout).astype(np.float32) * 0.1)
        packed = jax.jit(lambda s: PK.build_monotone_rule9(s, 3))(st)

        got = jax.jit(PK.subm_conv9)(st.features, packed, w, st.valid)
        S.set_compute_dtype(jnp.float32)
        try:
            pos9, found9 = jax.jit(lambda s: S.build_subm_rulebook9(s, 3))(st)
            want = jax.jit(S.gather_gemm9)(st.features, pos9, found9, w, st.valid)
        finally:
            S.set_compute_dtype(jnp.bfloat16)
        check(f"{tag} forward", got, want)

        def f_p(feats, w):
            return (PK.subm_conv9(feats, packed, w, st.valid) ** 2).sum()

        def f_x(feats, w):
            S.set_compute_dtype(jnp.float32)
            try:
                return (S.gather_gemm9(feats, pos9, found9, w, st.valid) ** 2).sum()
            finally:
                S.set_compute_dtype(jnp.bfloat16)

        gp = jax.jit(jax.grad(f_p, argnums=(0, 1)))(st.features, w)
        gx = jax.jit(jax.grad(f_x, argnums=(0, 1)))(st.features, w)
        # both sides accumulate in bf16-adjacent paths over 1500 rows;
        # bound by norm-relative error, not elementwise atol
        check_norm(f"{tag} dFeat", gp[0], gx[0])
        check_norm(f"{tag} dW", gp[1], gx[1])

    # --- merge_rank_flags vs searchsorted ---------------------------------
    keys = np.sort(rs.choice(1 << 20, size=2048, replace=False)).astype(np.int32)
    queries = np.sort(rs.choice(1 << 20, size=2048, replace=False)).astype(np.int32)
    packed = jax.jit(PK.merge_rank_flags)(jnp.asarray(keys), jnp.asarray(queries)[None])
    cnt = np.asarray(packed[0]) >> 3
    fmid = ((np.asarray(packed[0]) >> 1) & 1).astype(bool)
    want_cnt = np.searchsorted(keys, queries, side="left")
    want_mid = (
        (want_cnt < len(keys)) & (keys[np.minimum(want_cnt, len(keys) - 1)] == queries)
    )
    check("merge_rank_flags count", cnt, want_cnt, rtol=0, atol=0)
    check("merge_rank_flags found-mid", fmid, want_mid, rtol=0, atol=0)

    # --- strided (downsample) conv vs XLA path ----------------------------
    st = make_sparse(2, 1200, 2048, 16)
    w = jnp.asarray(rs.randn(27, 16, 32).astype(np.float32) * 0.1)
    def down(s, w, backend):
        return S.spconv_downsample(
            s, w, kernel_size=3, stride=2, padding=1, max_out=1024,
            backend=backend,
        )

    out_p = jax.jit(lambda s, w: down(s, w, "pallas"))(st, w)
    out_x = jax.jit(lambda s, w: down(s, w, "xla"))(st, w)
    # identical site sets (sorted keys) → features comparable per row
    kp = np.asarray(S.linear_key(out_p.coords, out_p.spatial_shape, out_p.valid))
    kx = np.asarray(S.linear_key(out_x.coords, out_x.spatial_shape, out_x.valid))
    check("strided site keys", kp, kx, rtol=0, atol=0)
    vp = np.asarray(out_p.valid)
    check("strided features", np.asarray(out_p.features)[vp],
          np.asarray(out_x.features)[np.asarray(out_x.valid)])

    print(f"\n{'OK' if not FAILED else 'FAILURES: ' + ', '.join(FAILED)} "
          f"({time.time() - t0:.0f}s)", flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
