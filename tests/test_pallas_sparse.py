"""Pallas fused sparse-conv kernels vs the XLA gather-GEMM oracle.

Runs in interpret mode on the CPU test mesh; the real TPU path is exercised
by bench.py / the driver's compile check.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.ops import sparse as S
from efg_tpu.ops.pallas import sparse_kernels as PK

from test_sparse_conv import _dense_conv, _make_sparse

PK.set_interpret(True)


def _rand_weights(rs, k, cin, cout, scale=0.1):
    return jnp.asarray(rs.randn(k, cin, cout).astype(np.float32) * scale)


def test_monotone_rule_matches_rule9_semantics():
    st, _ = _make_sparse(seed=0, n=48, cap=64)
    packed = PK.build_monotone_rule9(st, 3)
    assert packed.shape == (9, st.capacity)
    pos = np.asarray(packed) >> 3
    assert (np.diff(pos, axis=1) >= 0).all(), "pos must be monotone per pair"
    # found bits agree with the XLA rule9 builder
    pos9, found9 = S.build_subm_rulebook9(st, 3)
    f_old = np.asarray(found9)  # [P, 3, V]
    p = np.asarray(packed)
    f_new = np.stack([(p >> 2) & 1, (p >> 1) & 1, p & 1], axis=1).astype(bool)
    np.testing.assert_array_equal(f_new, f_old)
    # where the middle tap is found, pos equals the XLA insertion position
    pos_x = np.asarray(pos9)
    np.testing.assert_array_equal(pos[f_old[:, 1]], pos_x[f_old[:, 1]])


@pytest.mark.parametrize("cin,cout", [(4, 6), (8, 8), (5, 7), (24, 12)])
def test_fused_gather_gemm_matches_oracle(cin, cout):
    st, dense = _make_sparse(seed=1, n=48, cap=64, c=cin)
    rs = np.random.RandomState(2)
    w = _rand_weights(rs, 27, cin, cout)
    packed = PK.build_monotone_rule9(st, 3)

    got = PK.subm_conv9(st.features, packed, w, st.valid)

    S.set_compute_dtype(jnp.float32)
    try:
        pos9, found9 = S.build_subm_rulebook9(st, 3)
        want = S.gather_gemm9(st.features, pos9, found9, w, st.valid)
    finally:
        S.set_compute_dtype(jnp.bfloat16)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)

    # and against the dense conv oracle at valid sites
    wk = np.asarray(w).reshape(3, 3, 3, cin, cout)
    dense_out = _dense_conv(dense, wk)
    coords = np.asarray(st.coords)
    for i in np.flatnonzero(np.asarray(st.valid)):
        b, z, y, x = coords[i]
        np.testing.assert_allclose(
            np.asarray(got)[i], dense_out[b, z, y, x], rtol=3e-2, atol=3e-2
        )


@pytest.mark.parametrize("cin,cout", [(4, 6), (16, 16), (8, 32)])
def test_fused_vjp_matches_oracle(cin, cout):
    # cout % 16 == 0 rows exercise the emit_stacked dW-as-dense-GEMM path
    st, _ = _make_sparse(seed=3, n=40, cap=64, c=cin)
    rs = np.random.RandomState(4)
    w = _rand_weights(rs, 27, cin, cout)
    packed = PK.build_monotone_rule9(st, 3)
    pos9, found9 = S.build_subm_rulebook9(st, 3)

    def f_pallas(feats, w):
        return jnp.sum(PK.subm_conv9(feats, packed, w, st.valid) ** 2)

    def f_xla(feats, w):
        return jnp.sum(S.gather_gemm9(feats, pos9, found9, w, st.valid) ** 2)

    S.set_compute_dtype(jnp.float32)
    try:
        gp = jax.grad(f_pallas, argnums=(0, 1))(st.features, w)
        gx = jax.grad(f_xla, argnums=(0, 1))(st.features, w)
    finally:
        S.set_compute_dtype(jnp.bfloat16)

    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), rtol=3e-2, atol=3e-2)
    # dW tolerance: the flip formula is exact in f32 (verified vs the XLA
    # oracle to 0.0); the residual is bf16 gather-buffer rounding, ~1% of
    # |dW| (the dedicated dW kernel shows the same order vs the oracle)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), rtol=3e-2, atol=8e-2)


def test_tile_padding_and_overflow_path():
    # V not a multiple of TILE and windows crossing chunk boundaries
    st, _ = _make_sparse(seed=5, n=60, cap=100, c=4, shape=(4, 9, 33))
    rs = np.random.RandomState(6)
    w = _rand_weights(rs, 27, 4, 4)
    packed = PK.build_monotone_rule9(st, 3)
    # band=16 forces the overflow loop (spans of 100 rows >> 16)
    got = PK.fused_gather_gemm(
        st.features, packed, w.reshape(27 * 4, 4), tile=128, band=16
    )
    S.set_compute_dtype(jnp.float32)
    try:
        pos9, found9 = S.build_subm_rulebook9(st, 3)
        want = S.gather_gemm9(st.features, pos9, found9, w, st.valid)
    finally:
        S.set_compute_dtype(jnp.bfloat16)
    got = got * np.asarray(st.valid)[:, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize(
    "ks,stride,pad,kw3,cout",
    [((3, 3, 3), (2, 2, 2), (1, 1, 1), 3, 6),
     ((3, 3, 3), (2, 2, 2), (0, 1, 1), 3, 6),
     ((3, 3, 3), (2, 2, 2), (1, 1, 1), 3, 16),  # emit_stacked dW path
     ((3, 1, 1), (2, 1, 1), (0, 0, 0), 1, 6),
     ((3, 1, 1), (2, 1, 1), (0, 0, 0), 1, 16)],  # emit path, kw=1 routing
)
def test_strided_conv_packed_matches_xla(ks, stride, pad, kw3, cout):
    """Pallas strided forward + VJP vs the XLA spconv_downsample path."""
    cin, max_out = 5, 96
    st, _ = _make_sparse(seed=5, n=48, cap=64, c=cin)
    rs = np.random.RandomState(6)
    k = ks[0] * ks[1] * ks[2]
    w = _rand_weights(rs, k, cin, cout)

    S.set_compute_dtype(jnp.float32)
    try:
        def run(backend, w):
            out = S.spconv_downsample(
                st, w, kernel_size=ks, stride=stride, padding=pad,
                max_out=max_out, backend=backend,
            )
            return out

        want = run("xla", w)
        got = run("pallas", w)
    finally:
        S.set_compute_dtype(jnp.bfloat16)

    np.testing.assert_array_equal(np.asarray(got.keys), np.asarray(want.keys))
    np.testing.assert_allclose(
        np.asarray(got.features), np.asarray(want.features), rtol=2e-2, atol=2e-2
    )

    # gradients: d_features and dW against the XLA path
    def loss(backend, f, w):
        out = S.spconv_downsample(
            st.replace(features=f), w, kernel_size=ks, stride=stride,
            padding=pad, max_out=max_out, backend=backend,
        )
        return jnp.sum(out.features ** 2)

    S.set_compute_dtype(jnp.float32)
    try:
        gf_x, gw_x = jax.grad(lambda f, w: loss("xla", f, w), (0, 1))(st.features, w)
        gf_p, gw_p = jax.grad(lambda f, w: loss("pallas", f, w), (0, 1))(st.features, w)
    finally:
        S.set_compute_dtype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x), rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), rtol=3e-2, atol=3e-2)


def _rank_oracle(keys, queries):
    """numpy searchsorted + membership reference for merge_rank_flags."""
    kv = np.asarray(keys)
    kv = kv[kv < PK.INVALID_Q]
    out = np.zeros(queries.shape, np.int32)
    kset = set(kv.tolist())
    for pi in range(queries.shape[0]):
        for vi in range(queries.shape[1]):
            q = int(queries[pi, vi])
            if q >= PK.INVALID_Q:
                # padding: only pos is meaningful
                out[pi, vi] = len(kv) * 8
                continue
            cnt = int(np.searchsorted(kv, q, side="left"))
            out[pi, vi] = (
                cnt * 8
                + ((q - 1) in kset) * 4
                + (q in kset) * 2
                + ((q + 1) in kset)
            )
    return out


@pytest.mark.parametrize("impl", ["seq", "seq4"])
def test_merge_rank_flags_impls(impl, monkeypatch):
    monkeypatch.setattr(PK, "_RANK_IMPL", impl)
    rs = np.random.RandomState(3)
    n = 700
    keys = np.unique(rs.randint(0, 5000, n).astype(np.int32))
    keys = np.pad(keys, (0, n - len(keys)), constant_values=PK._CLAMP_Q)
    # strictly-increasing valid queries per pair (the kernel's contract)
    base = np.sort(rs.choice(6000, 600, replace=False)).astype(np.int32)
    queries = np.stack([base, base + 37, np.minimum(base + 1111, PK._CLAMP_Q)])
    got = np.asarray(PK.merge_rank_flags(jnp.asarray(keys), jnp.asarray(queries)))
    want = _rank_oracle(keys, queries)
    valid = queries < PK.INVALID_Q
    np.testing.assert_array_equal(got[valid], want[valid])
    # pos monotone everywhere (incl. padding)
    assert (np.diff(got >> 3, axis=1) >= 0).all()


@pytest.mark.parametrize("impl", ["seq", "seq4"])
def test_merge_rank_flags_chunk_boundary_qm1(impl, monkeypatch):
    """The q−1 neighbor of a pair's FIRST query sits at insertion
    position−1: when that position is an exact chunk multiple the key lives
    in the previous chunk — the seed must start one key early."""
    monkeypatch.setattr(PK, "_RANK_IMPL", impl)
    for chunk in (128, 512):
        # keys 0..chunk-1 occupy exactly the first chunk(s); first query is
        # `chunk` → insertion position == chunk (a chunk multiple), and key
        # chunk−1 (= q−1) is the last element of the previous chunk
        keys = np.arange(chunk, dtype=np.int32)
        keys = np.pad(keys, (0, 64), constant_values=PK._CLAMP_Q)
        queries = (np.arange(64, dtype=np.int32) * 2 + chunk)[None]
        got = np.asarray(
            PK.merge_rank_flags(jnp.asarray(keys), jnp.asarray(queries))
        )
        want = _rank_oracle(keys, queries)
        np.testing.assert_array_equal(got, want)


def test_g3_grid_matches_default(monkeypatch):
    """Group-merged forward grid (EFG_SPARSE_G3) must be bit-identical to
    the (tile, group) grid, incl. the emitted stacked tap buffer."""
    st, feats = _make_sparse(seed=5, n=180, cap=256)
    rs = np.random.RandomState(5)
    cin, cout = 16, 16
    f = jnp.asarray(rs.randn(st.capacity, cin).astype(np.float32))
    f = f * st.valid[:, None]
    w = _rand_weights(rs, 27, cin, cout)
    rule = PK.prep_rulebook(PK.build_monotone_rule9(st, 3), st.capacity, cin)
    w2d = w.reshape(27 * cin, cout)

    monkeypatch.setattr(PK, "_G3", False)
    out_ref, st_ref = PK.fused_gather_gemm(f, rule, w2d, emit_stacked=True)
    monkeypatch.setattr(PK, "_G3", True)
    out_g3, st_g3 = PK.fused_gather_gemm(f, rule, w2d, emit_stacked=True)
    np.testing.assert_array_equal(np.asarray(out_g3), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(st_g3), np.asarray(st_ref))


@pytest.mark.parametrize(
    "ks,stride,pad",
    [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
     ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
     ((3, 3, 3), (2, 2, 1), (1, 1, 0)),  # sw=1, kw=3 branch
     ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
     ((3, 1, 1), (2, 2, 2), (1, 0, 0))],
)
def test_derive_strided_inverse_matches_merge_builder(ks, stride, pad):
    """The transposed-forward inverse builder must agree with the merge-join
    inverse builder: identical wmap, identical flag bits everywhere, and
    identical pos on every row that carries a flag (un-flagged rows only
    need monotone pos — window sizing, not correctness)."""
    for seed in (0, 5, 11):
        st, _ = _make_sparse(seed=seed, n=48, cap=64, c=4)
        d, h, w = st.spatial_shape
        od = (d + 2 * pad[0] - ks[0]) // stride[0] + 1
        oh = (h + 2 * pad[1] - ks[1]) // stride[1] + 1
        ow = (w + 2 * pad[2] - ks[2]) // stride[2] + 1
        out_st = S.spconv_downsample(
            st, jnp.zeros((ks[0] * ks[1] * ks[2], 4, 4), jnp.float32),
            kernel_size=ks, stride=stride, padding=pad, max_out=96,
        )
        out_keys = out_st.keys

        inv_m, wmap_m = PK.build_monotone_rule_strided_inverse(
            st, out_keys, (od, oh, ow), ks, stride, pad
        )
        fwd = PK.build_monotone_rule_strided(
            st, out_st.coords[:, 0], out_st.coords[:, 1], out_st.coords[:, 2],
            out_st.coords[:, 3], out_st.valid, ks, stride, pad
        )
        inv_d, wmap_d = PK.derive_strided_inverse(
            fwd, out_keys, st.capacity, ks, stride, pad
        )

        assert wmap_d == wmap_m
        m, dv = np.asarray(inv_m), np.asarray(inv_d)
        assert m.shape == dv.shape
        np.testing.assert_array_equal(dv & 7, m & 7)
        flagged = (m & 7) > 0
        np.testing.assert_array_equal((dv >> 3)[flagged], (m >> 3)[flagged])
        assert (np.diff(dv >> 3, axis=1) >= 0).all(), "derived pos not monotone"


def test_subm_derive_matches_full_merge(monkeypatch):
    """EFG_SUBM_DERIVE=1 (transpose the Δ>0 pairs from the merged Δ<0 half)
    must reproduce the full-merge rule9: identical flags everywhere,
    identical pos on flagged rows, monotone pos everywhere."""
    import os
    for seed in (0, 7, 13):
        st, _ = _make_sparse(seed=seed, n=52, cap=64, c=4)
        monkeypatch.delenv("EFG_SUBM_DERIVE", raising=False)
        full = np.asarray(PK.build_monotone_rule9(st, 3))
        monkeypatch.setenv("EFG_SUBM_DERIVE", "1")
        got = np.asarray(PK.build_monotone_rule9(st, 3))
        np.testing.assert_array_equal(got & 7, full & 7)
        flagged = (full & 7) > 0
        np.testing.assert_array_equal((got >> 3)[flagged], (full >> 3)[flagged])
        assert (np.diff(got >> 3, axis=1) >= 0).all()
