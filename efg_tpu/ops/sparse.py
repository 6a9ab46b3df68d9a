"""Sparse 3D convolution on TPU: sorted-key rulebooks + gather-GEMM.

This replaces the reference's external `spconv` dependency (used by the
entire 3D backbone, `efg/modeling/backbones/sparse_net.py:6-11`) with a
TPU-native formulation:

- A `SparseTensor` is a fixed-capacity array of voxel rows: `features
  [V, C]`, `coords [V, 4] (b, z, y, x)`, a validity mask, and the sorted
  linearized `keys` of the occupied sites. Fixed V keeps every shape
  static under jit.
- Neighbor lookup is `searchsorted` over the sorted keys — one vectorized
  binary search per kernel offset — producing a "rulebook" `[K, V]` of
  input row indices (-1 = absent). Rulebooks depend only on coordinates,
  so submanifold layers sharing a coordinate set reuse one rulebook
  (the TPU analog of spconv's `indice_key`).
- The conv itself is gather → GEMM → accumulate over kernel offsets,
  i.e. `out = Σ_k gather(features, rule[k]) @ W[k]` — all FLOPs land on
  the MXU as [V, Cin] × [Cin, Cout] matmuls.
- Strided (generative) conv enumerates ≤⌈k/s⌉³ candidate output sites per
  input voxel, dedups them with one sort, then runs the same gather-GEMM
  against the new coordinate set.

Determinism: voxel rows are always sorted by key; ties impossible.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

_SENTINEL = jnp.iinfo(jnp.int32).max


def _as3(v) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3
    return t


@struct.dataclass
class SparseTensor:
    """Fixed-capacity batched sparse voxel tensor (rows sorted by key)."""

    features: jax.Array  # [V, C]
    coords: jax.Array  # [V, 4] int32 (b, z, y, x); zeros where invalid
    keys: jax.Array  # [V] int32 sorted; SENTINEL where invalid
    valid: jax.Array  # [V] bool
    spatial_shape: Tuple[int, int, int] = struct.field(pytree_node=False)  # (D, H, W)
    batch_size: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.features.shape[0]

    @property
    def num_channels(self) -> int:
        return self.features.shape[1]

    def replace_features(self, features: jax.Array) -> "SparseTensor":
        return self.replace(features=features)


def linear_key(coords: jax.Array, spatial_shape: Sequence[int], valid: jax.Array) -> jax.Array:
    """(b, z, y, x) → sorted-friendly int32 key; invalid rows → SENTINEL."""
    d, h, w = spatial_shape
    b, z, y, x = coords[..., 0], coords[..., 1], coords[..., 2], coords[..., 3]
    key = ((b * d + z) * h + y) * w + x
    return jnp.where(valid, key, _SENTINEL)


def from_batched_voxels(
    features: jax.Array,
    coords_zyx: jax.Array,
    valid: jax.Array,
    spatial_shape: Sequence[int],
) -> SparseTensor:
    """Build a SparseTensor from per-sample voxelizer output.

    features [B, V, C], coords_zyx [B, V, 3], valid [B, V]. Each sample's
    rows are key-sorted already, but padding (SENTINEL) rows sit between
    samples after flattening, so one global key sort restores the invariant
    the rulebook lookups rely on (all padding compacts to the tail).
    """
    bsz, cap = features.shape[0], features.shape[1]
    d, h, w = (int(s) for s in spatial_shape)
    assert bsz * d * h * w < 2**31, "linear key overflows int32; shard the batch"
    batch_idx = jnp.broadcast_to(
        jnp.arange(bsz, dtype=jnp.int32)[:, None], (bsz, cap)
    )
    coords = jnp.concatenate([batch_idx[..., None], coords_zyx.astype(jnp.int32)], axis=-1)
    coords = coords.reshape(bsz * cap, 4)
    valid = valid.reshape(bsz * cap)
    feats = features.reshape(bsz * cap, features.shape[-1])
    coords = coords * valid[:, None].astype(jnp.int32)
    keys = linear_key(coords, (d, h, w), valid)
    keys, order = jax.lax.sort_key_val(keys, jnp.arange(bsz * cap, dtype=jnp.int32))
    return SparseTensor(feats[order], coords[order], keys, valid[order], (d, h, w), bsz)


def _lookup(keys: jax.Array, query: jax.Array, query_ok: jax.Array) -> jax.Array:
    """Find row index of each query key in sorted `keys`; -1 if absent."""
    cap = keys.shape[0]
    pos = jnp.searchsorted(keys, query, side="left").astype(jnp.int32)
    pos_c = jnp.minimum(pos, cap - 1)
    found = (keys[pos_c] == query) & query_ok & (query != _SENTINEL)
    return jnp.where(found, pos_c, -1)


def _offsets(kernel_size: Tuple[int, int, int]) -> jax.Array:
    """[K, 3] (dz, dy, dx) offsets relative to the centered kernel origin."""
    kd, kh, kw = kernel_size
    dz, dy, dx = jnp.meshgrid(
        jnp.arange(kd) - (kd - 1) // 2,
        jnp.arange(kh) - (kh - 1) // 2,
        jnp.arange(kw) - (kw - 1) // 2,
        indexing="ij",
    )
    return jnp.stack([dz.ravel(), dy.ravel(), dx.ravel()], axis=-1).astype(jnp.int32)


def build_subm_rulebook(st: SparseTensor, kernel_size=3) -> jax.Array:
    """Rulebook [K, V] for a submanifold conv on `st`'s coordinate set.

    rule[k, v] = input row index of neighbor at kernel offset k for output
    row v (same coordinate set), or -1. Reusable by every SubM layer on the
    same coords (spconv `indice_key` semantics, `sparse_net.py:79-545`).

    Cost trick: rows are sorted by linearized (b, z, y, x) keys, so for a
    fixed (δz, δy) the δx = ±1 neighbors sit immediately next to the δx = 0
    lookup position — one binary search serves three offsets (9 searches
    for a 3×3×3 kernel instead of 27; measured 3× faster rulebook builds).
    """
    ks = _as3(kernel_size)
    assert ks[2] == 3 or ks[2] == 1, "x-kernel must be 1 or 3 for the adjacency trick"
    d, h, w = st.spatial_shape
    cap = st.capacity
    kd, kh, kw = ks

    x = st.coords[:, 3]
    rows = []
    for dz in range(-(kd - 1) // 2, (kd - 1) // 2 + 1):
        for dy in range(-(kh - 1) // 2, (kh - 1) // 2 + 1):
            nz = st.coords[:, 1] + dz
            ny = st.coords[:, 2] + dy
            ok0 = (
                st.valid
                & (nz >= 0) & (nz < d)
                & (ny >= 0) & (ny < h)
            )
            q0 = ((st.coords[:, 0] * d + nz) * h + ny) * w + x
            q0 = jnp.where(ok0, q0, _SENTINEL)
            pos = jnp.searchsorted(st.keys, q0, side="left").astype(jnp.int32)
            pos_c = jnp.minimum(pos, cap - 1)
            found0 = (st.keys[pos_c] == q0) & ok0 & (q0 != _SENTINEL)
            center = jnp.where(found0, pos_c, -1)
            if kw == 1:
                rows.append(center)
                continue
            # δx = -1: the element strictly before the insertion point
            pm = jnp.clip(pos - 1, 0, cap - 1)
            okm = ok0 & (x - 1 >= 0)
            foundm = (st.keys[pm] == q0 - 1) & okm & (pos > 0)
            rows.append(jnp.where(foundm, pm, -1))
            rows.append(center)
            # δx = +1: just after the (possibly present) center
            pp = jnp.minimum(pos + found0.astype(jnp.int32), cap - 1)
            okp = ok0 & (x + 1 < w)
            foundp = (st.keys[pp] == q0 + 1) & okp
            rows.append(jnp.where(foundp, pp, -1))
    return jnp.stack(rows)  # [K, V] in (dz, dy, dx) raster order


COMPUTE_DTYPE = jnp.bfloat16  # MXU-native; accumulation stays f32


def set_compute_dtype(dtype) -> None:
    """Switch the sparse-conv GEMM input dtype (bf16 default; f32 for
    bit-exact oracle comparisons)."""
    global COMPUTE_DTYPE
    COMPUTE_DTYPE = dtype


def _gather_gemm_impl(
    features: jax.Array,
    rulebook: jax.Array,
    weights: jax.Array,
    out_valid: jax.Array,
) -> jax.Array:
    """out[v] = Σ_k features[rule[k, v]] @ W[k]   (missing neighbors → 0).

    features [V_in, Cin], rulebook [K, V_out], weights [K, Cin, Cout].
    The hot loop of the sparse conv: K gathers + K MXU GEMMs via lax.scan,
    in bf16 with f32 accumulation.
    """
    cout = weights.shape[-1]
    v_out = rulebook.shape[1]
    out_dtype = features.dtype
    features = features.astype(COMPUTE_DTYPE)

    def step(acc, kw):
        rule_k, w_k = kw
        ok = rule_k >= 0
        idx = jnp.where(ok, rule_k, 0)
        g = features[idx] * ok[:, None].astype(features.dtype)
        return acc + jnp.dot(
            g, w_k.astype(COMPUTE_DTYPE),
            preferred_element_type=jnp.float32,
        ), None

    init = jnp.zeros((v_out, cout), dtype=jnp.float32)
    out, _ = jax.lax.scan(step, init, (rulebook, weights))
    out = out.astype(out_dtype)
    return out * out_valid[:, None].astype(out.dtype)


def gather_gemm(
    features: jax.Array,
    rulebook: jax.Array,
    weights: jax.Array,
    out_valid: jax.Array,
    *,
    rulebook_inv: Optional[jax.Array] = None,
    precision=None,
) -> jax.Array:
    """Sparse-conv contraction. When `rulebook_inv` is given (SubM convs:
    the kernel-flipped rulebook, since input and output coordinate sets
    coincide), a custom VJP computes d_features as ANOTHER gather-GEMM
    instead of XLA's scatter-add — scatters are the slow path on TPU."""
    if rulebook_inv is None:
        return _gather_gemm_impl(features, rulebook, weights, out_valid)

    @jax.custom_vjp
    def f(feats, w):
        return _gather_gemm_impl(feats, rulebook, w, out_valid)

    def fwd(feats, w):
        return f(feats, w), (feats, w)

    def bwd(res, g):
        feats, w = res
        g = g * out_valid[:, None].astype(g.dtype)
        # d_feats[v] = Σ_k g[rule_inv[k, v]] @ W[k]ᵀ  (gather, not scatter)
        d_feats = _gather_gemm_impl(
            g, rulebook_inv, jnp.swapaxes(w, 1, 2),
            jnp.ones_like(out_valid),
        ).astype(feats.dtype)

        # d_W[k] = gathered_kᵀ @ g
        def step(_, rule_k):
            ok = rule_k >= 0
            idx = jnp.where(ok, rule_k, 0)
            gath = feats[idx] * ok[:, None].astype(feats.dtype)
            dw_k = jnp.dot(
                gath.T.astype(COMPUTE_DTYPE), g.astype(COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            return None, dw_k

        _, d_w = jax.lax.scan(step, None, rulebook)
        return d_feats, d_w.astype(w.dtype)

    f.defvjp(fwd, bwd)
    return f(features, weights)


# Above this many grid cells, direct index tables (int32 per cell) are too
# large and lookups fall back to binary search over the sorted keys.
# 600M cells covers the full-res Waymo grid at batch 6 (6 × 41×1504×1504 ≈
# 556M → a transient 2.2GB int32 table; its memset costs ~ms on HBM vs
# tens of ms of binary-search gathers).
DENSE_GRID_LIMIT = 600_000_000


def _grid_cells(st: SparseTensor) -> int:
    d, h, w = st.spatial_shape
    return st.batch_size * d * h * w


def _make_index_table(st: SparseTensor, pad: int = 1) -> jax.Array:
    """Dense cell → row-index table (-1 empty) — the device analog of the
    reference CPU voxelizer's `coor_to_voxelidx` grid
    (`efg/geometry/point_cloud_ops.py`). One scatter of V int32. `pad`
    sentinel cells are placed on both sides so 3-wide sliced gathers at
    cell−1 never need clipping (index with +pad offset)."""
    size = _grid_cells(st)
    idx = jnp.where(st.valid, st.keys + pad, size + 2 * pad)
    return (
        jnp.full(size + 2 * pad + 1, -1, jnp.int32)
        .at[idx]
        .set(jnp.arange(st.capacity, dtype=jnp.int32), mode="drop")[: size + 2 * pad]
    )


def _rule9_from_table(st: SparseTensor, table: jax.Array, kernel_size):
    """rule9 via ONE 3-wide sliced table gather per (δz, δy) pair: the
    (q0−1, q0, q0+1) cells are consecutive in the padded table."""
    ks = _as3(kernel_size)
    kd, kh, kw = ks
    assert kw == 3
    d, h, w = st.spatial_shape
    x = st.coords[:, 3]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    poss, founds = [], []
    for dz in range(-(kd - 1) // 2, (kd - 1) // 2 + 1):
        for dy in range(-(kh - 1) // 2, (kh - 1) // 2 + 1):
            nz = st.coords[:, 1] + dz
            ny = st.coords[:, 2] + dy
            ok0 = st.valid & (nz >= 0) & (nz < d) & (ny >= 0) & (ny < h)
            q0 = ((st.coords[:, 0] * d + nz) * h + ny) * w + x
            q0s = jnp.where(ok0, q0, 0)
            # padded table: slice (q0-1, q0, q0+1) starts at index q0
            tri = jax.lax.gather(
                table, q0s[:, None], dnums, slice_sizes=(3,),
                mode=jax.lax.GatherScatterMode.CLIP,
            )  # [V, 3]
            im = jnp.where(ok0 & (x - 1 >= 0), tri[:, 0], -1)
            i0 = jnp.where(ok0, tri[:, 1], -1)
            ip = jnp.where(ok0 & (x + 1 < w), tri[:, 2], -1)
            f0, fm, fp = i0 >= 0, im >= 0, ip >= 0
            # reconstruct the insertion position the rule9 gather expects:
            # rows (im, i0, ip) are consecutive when present
            pos = jnp.where(f0, i0, jnp.where(fp, ip, jnp.where(fm, im + 1, 0)))
            pos = jnp.clip(pos, 0, st.capacity - 1)
            poss.append(pos)
            founds.append(jnp.stack([fm, f0, fp]))
    return jnp.stack(poss), jnp.stack(founds)


def build_subm_rulebook9(st: SparseTensor, kernel_size=3):
    """Compact SubM rulebook: per (δz, δy) pair, the insertion position
    `pos` of the δx = 0 query plus found-masks for δx ∈ {−1, 0, +1}.

    Rationale: XLA row-gather cost on TPU is ~per-row, independent of row
    width (measured), and the three x-neighbors sit at pos−1 / pos /
    pos+1 in the sorted row order — so one 3C-wide gather at `pos` serves
    three kernel taps. 9 gathers instead of 27 for a 3×3×3 kernel.

    Returns (pos [P, V], found [P, 3, V]) with P = kd·kh, found order
    (δx=−1, 0, +1). For kw == 1 use the plain 27-rulebook path.

    Small grids use a dense index table (one scatter + 3 gathers per pair);
    large grids binary-search the sorted keys.
    """
    ks = _as3(kernel_size)
    kd, kh, kw = ks
    assert kw == 3, "rule9 requires a 3-wide x kernel"
    if _grid_cells(st) <= DENSE_GRID_LIMIT:
        return _rule9_from_table(st, _make_index_table(st), kernel_size)
    d, h, w = st.spatial_shape
    cap = st.capacity
    x = st.coords[:, 3]

    poss, founds = [], []
    for dz in range(-(kd - 1) // 2, (kd - 1) // 2 + 1):
        for dy in range(-(kh - 1) // 2, (kh - 1) // 2 + 1):
            nz = st.coords[:, 1] + dz
            ny = st.coords[:, 2] + dy
            ok0 = st.valid & (nz >= 0) & (nz < d) & (ny >= 0) & (ny < h)
            q0 = ((st.coords[:, 0] * d + nz) * h + ny) * w + x
            q0 = jnp.where(ok0, q0, _SENTINEL)
            pos = jnp.searchsorted(st.keys, q0, side="left").astype(jnp.int32)
            pos_c = jnp.minimum(pos, cap - 1)
            f0 = (st.keys[pos_c] == q0) & (q0 != _SENTINEL)
            pm = jnp.clip(pos - 1, 0, cap - 1)
            fm = (st.keys[pm] == q0 - 1) & ok0 & (x - 1 >= 0) & (pos > 0) & (q0 != _SENTINEL)
            pp = jnp.minimum(pos + f0.astype(jnp.int32), cap - 1)
            fp = (st.keys[pp] == q0 + 1) & ok0 & (x + 1 < w) & (q0 != _SENTINEL)
            poss.append(pos_c)
            founds.append(jnp.stack([fm, f0, fp]))
    return jnp.stack(poss), jnp.stack(founds)  # [P, V], [P, 3, V]


def _gather_gemm9_impl(features, pos, found, weights, out_valid):
    """features [V, C], pos [P, V], found [P, 3, V], weights [P·3, C, O]
    in (pair, δx) order → [V, O]. One 3C gather + GEMM per pair.
    Gathered rows are bf16 (half the bytes per row; f32 accumulation)."""
    v, c = features.shape
    p3, _, cout = weights.shape
    p = p3 // 3
    out_dtype = features.dtype
    features = features.astype(COMPUTE_DTYPE)
    # concat[i] = (features[i-1], features[i], features[i+1]) → row gather at
    # `pos` yields rows pos−1 / pos / pos+1 in one shot
    fm1 = jnp.concatenate([features[:1] * 0, features[:-1]], axis=0)  # f[i-1]
    fp1 = jnp.concatenate([features[1:], features[:1] * 0], axis=0)   # f[i+1]
    concat = jnp.concatenate([fm1, features, fp1], axis=-1)  # [V, 3C]
    w9 = weights.reshape(p, 3, c, cout)

    def step(acc, args):
        pos_k, found_k, w_k = args  # [V], [3, V], [3, C, O]
        g = concat[pos_k]  # [V, 3C] = rows (pos-1, pos, pos+1)
        gm = g[:, :c]
        g0 = g[:, c : 2 * c]
        gp = g[:, 2 * c :]
        # δx=+1 row: pos+1 when the center was found, else the row AT pos
        gp_sel = jnp.where(found_k[1][:, None], gp, g0)
        stacked = jnp.concatenate(
            [
                gm * found_k[0][:, None].astype(g.dtype),
                g0 * found_k[1][:, None].astype(g.dtype),
                gp_sel * found_k[2][:, None].astype(g.dtype),
            ],
            axis=-1,
        )  # [V, 3C]
        return acc + jnp.dot(
            stacked,
            w_k.reshape(3 * c, cout).astype(COMPUTE_DTYPE),
            preferred_element_type=jnp.float32,
        ), None

    init = jnp.zeros((v, cout), jnp.float32)
    out, _ = jax.lax.scan(step, init, (pos, found, w9))
    out = out.astype(out_dtype)
    return out * out_valid[:, None].astype(out.dtype)


def gather_gemm9(features, pos, found, weights, out_valid):
    """rule9 sparse-conv contraction with a scatter-free custom VJP.

    Backward identity (input and output sites coincide):
    d_f = conv(g; W'_k = W_{flip(k)}ᵀ) evaluated over the SAME rulebook —
    a full reversal of the 27-raster (w[::-1]) flips (δz, δy, δx) jointly,
    so the rule9 layout needs no index changes, only flipped weights.
    """

    @jax.custom_vjp
    def f(feats, w):
        return _gather_gemm9_impl(feats, pos, found, w, out_valid)

    def fwd(feats, w):
        return f(feats, w), (feats, w)

    def bwd(res, g):
        feats, w = res
        g = g * out_valid[:, None].astype(g.dtype)
        p3, c, cout = w.shape
        w_flip = jnp.swapaxes(w[::-1], 1, 2)  # [P·3, O, C]
        d_feats = _gather_gemm9_impl(
            g, pos, found, w_flip, jnp.ones_like(out_valid),
        ).astype(feats.dtype)

        # dW via per-pair gathers of the saved inputs (bf16 rows)
        fb = feats.astype(COMPUTE_DTYPE)
        fm1 = jnp.concatenate([fb[:1] * 0, fb[:-1]], axis=0)
        fp1 = jnp.concatenate([fb[1:], fb[:1] * 0], axis=0)
        concat = jnp.concatenate([fm1, fb, fp1], axis=-1)

        def step(_, args):
            pos_k, found_k = args
            gr = concat[pos_k]
            gm = gr[:, :c] * found_k[0][:, None].astype(gr.dtype)
            g0 = gr[:, c : 2 * c] * found_k[1][:, None].astype(gr.dtype)
            gp = jnp.where(found_k[1][:, None], gr[:, 2 * c :], gr[:, c : 2 * c])
            gp = gp * found_k[2][:, None].astype(gr.dtype)
            stacked = jnp.concatenate([gm, g0, gp], axis=-1)  # [V, 3C]
            dw_k = jnp.dot(
                stacked.T, g.astype(COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )  # [3C, O]
            return None, dw_k.reshape(3, c, cout)

        _, dw = jax.lax.scan(step, None, (pos, found))
        return d_feats, dw.reshape(p3, c, cout).astype(w.dtype)

    f.defvjp(fwd, bwd)
    return f(features, weights)


def gather_gemm_strided(features, rulebook, weights, out_valid, *, v_in: int):
    """Strided-conv contraction with a scatter-free d_features.

    For a generative conv the map (k, v_out) → v_in is injective per k, so
    the inverse rulebook inv[k, v_in] = v_out is a cheap int scatter of the
    already-built forward rulebook; d_features then becomes a gather-GEMM
    over inv with transposed weights (no f32 scatter-add in the backward)."""

    @jax.custom_vjp
    def f(feats, w):
        return _gather_gemm_impl(feats, rulebook, w, out_valid)

    def fwd(feats, w):
        return f(feats, w), (feats, w)

    def bwd(res, g):
        feats, w = res
        g = g * out_valid[:, None].astype(g.dtype)
        k, v_out = rulebook.shape

        def invert(rule_k):
            tgt = jnp.where(rule_k >= 0, rule_k, v_in)
            return (
                jnp.full(v_in + 1, -1, jnp.int32)
                .at[tgt]
                .set(jnp.arange(v_out, dtype=jnp.int32), mode="drop")[:v_in]
            )

        inv = jax.vmap(invert)(rulebook)  # [K, V_in]
        d_feats = _gather_gemm_impl(
            g, inv, jnp.swapaxes(w, 1, 2), jnp.ones(v_in, bool)
        ).astype(feats.dtype)

        def step(_, rule_k):
            ok = rule_k >= 0
            idx = jnp.where(ok, rule_k, 0)
            gath = feats[idx] * ok[:, None].astype(feats.dtype)
            dw_k = jnp.dot(
                gath.T.astype(COMPUTE_DTYPE), g.astype(COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            return None, dw_k

        _, d_w = jax.lax.scan(step, None, rulebook)
        return d_feats, d_w.astype(w.dtype)

    f.defvjp(fwd, bwd)
    return f(features, weights)


class PackedRule9(tuple):
    """Marker wrapper for the packed monotone Pallas rulebook ([P, V] int32)."""

    __slots__ = ()

    def __new__(cls, packed):
        return super().__new__(cls, (packed,))

    @property
    def packed(self):
        return self[0]


def build_rulebook(st: SparseTensor, kernel_size: int = 3, backend: str = "xla"):
    """Backend-appropriate SubM rulebook: XLA rule9 tuple or the PREPPED
    packed monotone rulebook the Pallas kernels consume (prepped once per
    stage — the kernel-side derived arrays are shared by every SubM layer,
    forward and backward, of the stage)."""
    if backend == "pallas":
        from efg_tpu.ops.pallas import sparse_kernels as PK

        raw = PK.build_monotone_rule9(st, kernel_size)
        return PackedRule9(PK.prep_rulebook(raw, st.capacity, st.num_channels))
    return build_subm_rulebook9(st, kernel_size)


def default_backend() -> str:
    """Pallas on real TPU backends; XLA on CPU (tests run the Pallas path
    separately in interpret mode — too slow for every suite test)."""
    import jax as _jax

    return "xla" if _jax.default_backend() == "cpu" else "pallas"


def subm_conv(
    st: SparseTensor,
    weights: jax.Array,
    rulebook: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> SparseTensor:
    """Submanifold conv: output sites == input sites (reference SubMConv3d).

    `rulebook` may be the 27-format array, the compact XLA rule9 tuple
    (pos, found), or the packed monotone [P, V] int32 array (Pallas fused
    kernel); all use scatter-free custom VJPs."""
    if rulebook is None:
        if weights.shape[0] == 27:
            rulebook = build_subm_rulebook9(st, 3)
        else:
            k = round(weights.shape[0] ** (1 / 3))
            rulebook = build_subm_rulebook(st, k)
    if isinstance(rulebook, PackedRule9):
        from efg_tpu.ops.pallas import sparse_kernels as PK

        out = PK.subm_conv9(st.features, rulebook.packed, weights, st.valid)
    elif isinstance(rulebook, tuple):
        out = gather_gemm9(st.features, rulebook[0], rulebook[1], weights, st.valid)
    else:
        out = gather_gemm(
            st.features, rulebook, weights, st.valid, rulebook_inv=rulebook[::-1]
        )
    if bias is not None:
        out = (out + bias) * st.valid[:, None].astype(out.dtype)
    return st.replace_features(out)


def _downsample_shape(shape, kernel, stride, padding) -> Tuple[int, int, int]:
    return tuple(
        (shape[i] + 2 * padding[i] - kernel[i]) // stride[i] + 1 for i in range(3)
    )


def spconv_downsample(
    st: SparseTensor,
    weights: jax.Array,
    *,
    kernel_size,
    stride,
    padding,
    max_out: int,
    bias: Optional[jax.Array] = None,
    backend: str = "xla",
) -> SparseTensor:
    """Strided (generative) sparse conv, reference SparseConv3d semantics:
    output sites are every site whose kernel window touches ≥1 input voxel.

    weights [K, Cin, Cout] with K = prod(kernel_size), offsets in
    (dz, dy, dx) raster order from the kernel origin (not centered).
    """
    ks, s, p = _as3(kernel_size), _as3(stride), _as3(padding)
    d, h, w = st.spatial_shape
    od, oh, ow = _downsample_shape((d, h, w), ks, s, p)
    bsz = st.batch_size
    assert bsz * od * oh * ow < 2**31

    # --- 1. candidate output sites: o = (i + p - κ) / s, κ ∈ [0, k) ---------
    # per dim, at most ceil(k/s) distinct valid o; enumerate candidate o
    # directly per dim then combine.
    ncand = [-(-ks[i] // s[i]) for i in range(3)]  # ceil(k/s)

    def dim_candidates(i_coord, dim_i):
        # o in [ceil((i + p - k + 1)/s), floor((i + p)/s)], clipped to grid
        lo = -(-(i_coord + p[dim_i] - ks[dim_i] + 1) // s[dim_i])
        hi = (i_coord + p[dim_i]) // s[dim_i]
        offs = jnp.arange(ncand[dim_i], dtype=jnp.int32)  # [ncand]
        cand = lo[:, None] + offs[None, :]
        ok = (cand <= hi[:, None]) & (cand >= 0) & (cand < (od, oh, ow)[dim_i])
        return cand, ok  # [V, ncand]

    cz, okz = dim_candidates(st.coords[:, 1], 0)
    cy, oky = dim_candidates(st.coords[:, 2], 1)
    cx, okx = dim_candidates(st.coords[:, 3], 2)

    nz_, ny_, nx_ = ncand
    v = st.capacity
    oz = jnp.broadcast_to(cz[:, :, None, None], (v, nz_, ny_, nx_))
    oy = jnp.broadcast_to(cy[:, None, :, None], (v, nz_, ny_, nx_))
    ox = jnp.broadcast_to(cx[:, None, None, :], (v, nz_, ny_, nx_))
    ok = (
        okz[:, :, None, None]
        & oky[:, None, :, None]
        & okx[:, None, None, :]
        & st.valid[:, None, None, None]
    )
    b = jnp.broadcast_to(st.coords[:, 0, None, None, None], (v, nz_, ny_, nx_))
    cand_key = ((b * od + oz) * oh + oy) * ow + ox
    cand_key = jnp.where(ok, cand_key, _SENTINEL).reshape(-1)

    # --- 2. dedup + truncate to max_out ------------------------------------
    out_cells = bsz * od * oh * ow
    if out_cells <= DENSE_GRID_LIMIT:
        # dense-grid dedup: mark + cumsum replaces the 8V-candidate sort;
        # grid raster order IS key order, so out_keys come out sorted
        valid_cand = cand_key != _SENTINEL
        mark_idx = jnp.where(valid_cand, cand_key, out_cells)
        mark = (
            jnp.zeros(out_cells + 1, jnp.int32).at[mark_idx].max(1, mode="drop")
        )[:out_cells]
        # NOTE: lax.associative_scan at this size (tens of millions) sends
        # the tunneled TPU compiler into >80-minute compiles; plain cumsum
        # compiles fine and the runtime difference is small at these sizes.
        slot_of_cell = jnp.cumsum(mark) - 1  # [cells]
        slot = slot_of_cell[jnp.clip(cand_key, 0, out_cells - 1)]
        write = jnp.where(valid_cand & (slot >= 0) & (slot < max_out), slot, max_out)
        out_keys = (
            jnp.full(max_out + 1, _SENTINEL, dtype=jnp.int32)
            .at[write]
            .min(cand_key, mode="drop")
        )[:max_out]
    else:
        sorted_keys = jax.lax.sort(cand_key)
        uniq_first = jnp.concatenate(
            [sorted_keys[:1] != _SENTINEL, sorted_keys[1:] != sorted_keys[:-1]]
        ) & (sorted_keys != _SENTINEL)
        slot = jnp.cumsum(uniq_first.astype(jnp.int32)) - 1
        write = jnp.where(uniq_first & (slot < max_out), slot, max_out)
        out_keys = (
            jnp.full(max_out + 1, _SENTINEL, dtype=jnp.int32).at[write].min(sorted_keys)
        )[:max_out]
    out_valid = out_keys != _SENTINEL
    key_safe = jnp.where(out_valid, out_keys, 0)
    ob = key_safe // (od * oh * ow)
    ozc = (key_safe // (oh * ow)) % od
    oyc = (key_safe // ow) % oh
    oxc = key_safe % ow
    out_coords = (
        jnp.stack([ob, ozc, oyc, oxc], axis=-1) * out_valid[:, None].astype(jnp.int32)
    )

    # --- 3. rulebook vs INPUT keys: in = o*s - p + κ ------------------------
    kd, kh, kw = ks
    cap_in = st.capacity

    if backend == "pallas" and kw in (1, 3) and (kh == 3 or (kw == 1 and kh == 1)):
        from efg_tpu.ops.pallas import sparse_kernels as PK

        packed_raw = PK.build_monotone_rule_strided(
            st, ob, ozc, oyc, oxc, out_valid, ks, s, p
        )
        # default "merge": the hardware A/B (tools/bench_inverse.py,
        # 2026-08-20, Waymo bs=4 stage0 shape) measured the scatter+cummax
        # derivation at 75.0 ms vs 18.9 ms for the second merge-join — XLA
        # row-scatters cost ~3.3 ms each at 320k rows and the derivation
        # needs ~27 of them. Same verdict for the SubM transpose
        # (EFG_SUBM_DERIVE: 59.3 vs 18.8 ms). Both stay env-gated records
        # of a measured dead end, not defaults.
        if os.environ.get("EFG_INV_IMPL", "merge") == "derive":
            # transpose the forward rulebook — no second merge-join kernel
            inv_raw, wmap = PK.derive_strided_inverse(
                packed_raw, out_keys, st.capacity, ks, s, p
            )
        else:
            inv_raw, wmap = PK.build_monotone_rule_strided_inverse(
                st, out_keys, (od, oh, ow), ks, s, p
            )
        w_eff = weights
        if kh == 1:
            # builders expanded each κz pair to its own group of 3 (see
            # build_monotone_rule_strided): zero-pad the weight pairs to
            # match [κ0, 0, 0, κ1, 0, 0, …]
            cin_w, cout_w = weights.shape[1], weights.shape[2]
            w_eff = (
                jnp.zeros((3 * kd, cin_w, cout_w), weights.dtype)
                .at[::3]
                .set(weights)
            )
        # strided bands spread ~V_in/V_out wider than SubM's: per 128
        # output rows the input span is ~128·ratio plus gap slack — size
        # cover (=2·band) to ~1.5× that, and the window to the per-tile
        # span (static per layer from the capacities)
        ratio = max(1, -(-st.capacity // max_out))
        band = -(-(128 * ratio + 64) // 16) * 16  # swept: wider beats tight
        wslack = PK.TILE * (ratio - 1) + 2 * band + 256
        cin_w = w_eff.shape[1]
        cout_w = w_eff.shape[2]
        packed = PK.prep_rulebook(
            packed_raw, st.capacity, cin_w, band=band, wslack=wslack
        )
        inv = (PK.prep_rulebook(inv_raw, max_out, cout_w), wmap)
        out_feats = PK.strided_conv_packed(
            st.features, packed, w_eff, out_valid, kw3=kw,
            band=band, wslack=wslack, inv=inv,
        )
        if bias is not None:
            out_feats = (out_feats + bias) * out_valid[:, None].astype(out_feats.dtype)
        return SparseTensor(
            out_feats, out_coords, out_keys, out_valid, (od, oh, ow), bsz
        )

    in_cells = _grid_cells(st)
    if in_cells <= DENSE_GRID_LIMIT:
        # direct index-table lookups: one gather of [max_out] per offset
        table = _make_index_table(st)
        rows = []
        for kz_ in range(kd):
            for ky_ in range(kh):
                for kx_ in range(kw):
                    iz = ozc * s[0] - p[0] + kz_
                    iy = oyc * s[1] - p[1] + ky_
                    ix = oxc * s[2] - p[2] + kx_
                    okq = (
                        out_valid
                        & (iz >= 0) & (iz < d)
                        & (iy >= 0) & (iy < h)
                        & (ix >= 0) & (ix < w)
                    )
                    q = ((ob * d + iz) * h + iy) * w + ix
                    q = jnp.where(okq, q, 0)
                    rows.append(jnp.where(okq, table[q + 1], -1))  # +1: padded table
        rulebook = jnp.stack(rows)
        out_feats = gather_gemm_strided(
            st.features, rulebook, weights, out_valid, v_in=st.capacity
        )
        if bias is not None:
            out_feats = (out_feats + bias) * out_valid[:, None].astype(out_feats.dtype)
        return SparseTensor(out_feats, out_coords, out_keys, out_valid, (od, oh, ow), bsz)

    # large input grid: binary search with the x-adjacency trick (one search
    # per (κz, κy) serves all κx — consecutive κx differ by 1 in key space)
    rows = []
    for kz_ in range(kd):
        for ky_ in range(kh):
            iz = ozc * s[0] - p[0] + kz_
            iy = oyc * s[1] - p[1] + ky_
            ix0 = oxc * s[2] - p[2]  # κx = 0
            ok_zy = (
                out_valid
                & (iz >= 0) & (iz < d)
                & (iy >= 0) & (iy < h)
            )
            q0 = ((ob * d + iz) * h + iy) * w + ix0
            q0 = jnp.where(ok_zy & (ix0 >= 0) & (ix0 < w), q0, _SENTINEL)
            pos = jnp.searchsorted(st.keys, q0, side="left").astype(jnp.int32)
            pos_c = jnp.minimum(pos, cap_in - 1)
            found_prev = (st.keys[pos_c] == q0) & (q0 != _SENTINEL)
            prev_idx = jnp.where(found_prev, pos_c, -1)
            rows.append(prev_idx)
            run = pos + found_prev.astype(jnp.int32)
            for kx_ in range(1, kw):
                okx = ok_zy & (ix0 + kx_ >= 0) & (ix0 + kx_ < w)
                # q0 may be SENTINEL when κx=0 was out of grid but κx>0 is in:
                # recompute the query from coordinates directly
                qk = ((ob * d + iz) * h + iy) * w + ix0 + kx_
                run_c = jnp.minimum(run, cap_in - 1)
                found = (st.keys[run_c] == qk) & okx & (q0 != _SENTINEL)
                # fall back to a fresh search where the κx=0 query was invalid
                needs_search = okx & (q0 == _SENTINEL)
                qk_s = jnp.where(needs_search, qk, _SENTINEL)
                pos2 = jnp.searchsorted(st.keys, qk_s, side="left").astype(jnp.int32)
                pos2_c = jnp.minimum(pos2, cap_in - 1)
                found_s = (st.keys[pos2_c] == qk_s) & needs_search
                idx = jnp.where(found, run_c, jnp.where(found_s, pos2_c, -1))
                rows.append(idx)
                run = jnp.where(needs_search, pos2 + found_s.astype(jnp.int32),
                                run + found.astype(jnp.int32))
    rulebook = jnp.stack(rows)  # [K, max_out]

    out_feats = gather_gemm_strided(
        st.features, rulebook, weights, out_valid, v_in=st.capacity
    )
    if bias is not None:
        out_feats = (out_feats + bias) * out_valid[:, None].astype(out_feats.dtype)
    return SparseTensor(
        out_feats, out_coords, out_keys, out_valid, (od, oh, ow), bsz
    )


def to_dense(st: SparseTensor) -> jax.Array:
    """SparseTensor → dense [B, C, D, H, W] (reference `.dense()`)."""
    d, h, w = st.spatial_shape
    c = st.num_channels
    b = st.batch_size
    flat_idx = jnp.where(st.valid, st.keys, b * d * h * w)
    dense = (
        jnp.zeros((b * d * h * w + 1, c), dtype=st.features.dtype)
        .at[flat_idx]
        .set(jnp.where(st.valid[:, None], st.features, 0))
    )[:-1]
    return dense.reshape(b, d, h, w, c).transpose(0, 4, 1, 2, 3)


def bev_dense(st: SparseTensor) -> jax.Array:
    """SparseTensor → [B, D*C, H, W] BEV map (the `.dense()` + reshape used by
    `SpMiddleResNetFHD.forward`, `sparse_net.py:538-545`)."""
    dense = to_dense(st)  # [B, C, D, H, W]
    b, c, d, h, w = dense.shape
    return dense.reshape(b, c * d, h, w)
