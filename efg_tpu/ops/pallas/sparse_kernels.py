"""Pallas TPU kernels for the sparse-conv gather-GEMM (the round-1 perf wall).

Replaces XLA row-gathers (measured ~4 cycles/row → 9-40 ms per SubM layer at
Waymo scale) with a fused banded gather + MXU GEMM. Key observations:

1. Voxel rows are sorted by linearized (b, z, y, x) key, and for a fixed
   kernel-offset pair (δz, δy) the neighbor query keys are `keys + Δ` with
   constant Δ — so the lookup positions `pos` are MONOTONE in the row index.
2. The three δx taps live in ADJACENT rows (pos-1, pos, pos+found0), so the
   caller pre-concatenates `feat3[v] = (f[v-1], f[v], f[v+1])` (two shifted
   copies — cheap XLA) and ONE one-hot gather fetches all three taps.
3. The three δy pairs of one δz "group" look up rows only a few apart
   (±1 y-line ≈ a handful of voxel rows), so ONE window DMA per
   (tile, δz-group) serves three pairs — 3 DMAs per tile instead of 9
   (DMA issue cost ~1µs dominates many-small-DMA designs, measured).
4. Within the window, every 128 consecutive output rows read a NARROW band
   (~128·local-density rows, scalar-prefetched starts); the gather is a
   small one-hot [W, 128] matmul per band on the MXU (Mosaic has no general
   vectorized dynamic row-gather; probed 2026-08: lane-gather is 128-lane /
   32-bit only, sublane-gather and bf16 rolls crash). Bands with no found
   taps are skipped; bands escaping the window fall back to direct DMAs.
5. Gathered tap blocks accumulate into a stacked [27·C, T] VMEM buffer so
   the weight contraction is ONE dense [27C, T]ᵀ × [27C, O] MXU GEMM per
   tile (small-K per-tap GEMMs waste the 128-deep MXU K dimension).
6. The rulebook is ONE packed int32 per (pair, row): pos·8 + found bits,
   shaped [P, V] so rows land on the 128-lane axis (separate pos/found
   arrays with 1-3 trailing lanes get padded to 128 lanes in HBM — a
   hidden ~100× rulebook traffic blowup, measured).

Packed rulebook ("anchor" convention, shared by SubM and strided convs):
  packed[p, v] = pos·8 + fm·4 + f0·2 + fp, where pos is the insertion
  position of the MIDDLE tap's query key in the sorted input keys (monotone
  in v per pair) and (fm, f0, fp) flag the (δx=-1, 0, +1) tap neighbors.
Tap rows are (pos-1, pos, pos+f0): when the middle tap is absent its
insertion position IS the +1 neighbor's row (mirrors
`sparse.build_subm_rulebook9` / `_gather_gemm9_impl` exactly).

Reference capability being replaced: spconv's gather-GEMM
(`/root/reference/efg/modeling/backbones/sparse_net.py:473-545`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

TILE = int(_os.environ.get("EFG_SPARSE_TILE", 1024))
# output rows per grid step (TILE/128 bands per pair); env-tunable for sweeps
BAND = 128   # band rows per 128 output rows (r3 sweep: 128 beats 192/160;
             # 96 collapses into the fallback pass)
WSLACK = 512  # window rows beyond TILE (covers group spread + density)

# rank-kernel implementation: "seq" (128-key chunks) or "seq4" (512-key
# super-chunks, fewer while iterations) — A/B via env until measured on TPU
_RANK_IMPL = _os.environ.get("EFG_RANK_IMPL", "seq")

# group-merged forward grid (one step per tile instead of per (tile, group))
# — A/B via env until measured on TPU
_G3 = _os.environ.get("EFG_SPARSE_G3", "0") not in ("0", "", "false")

_INTERPRET = False  # set by tests to run kernels on CPU


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(flag)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _rup(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _taps_band(gvals, cols, cin):
    """Masked tap blocks ([cin, 128] bf16 ×3) for one band from the packed
    rulebook columns [1, 128]. `gvals` is the band's gathered [c3p, 128]."""
    fm = ((cols >> 2) & 1).astype(jnp.float32)
    f0 = ((cols >> 1) & 1).astype(jnp.float32)
    fp = (cols & 1).astype(jnp.float32)
    g = gvals.astype(jnp.bfloat16)
    gm = g[0:cin] * fm.astype(jnp.bfloat16)
    g0 = g[cin : 2 * cin]
    # +1 tap: row pos+1 when the middle tap exists, else the row AT pos
    gp = jnp.where(f0 > 0, g[2 * cin : 3 * cin], g0) * fp.astype(jnp.bfloat16)
    return gm, g0 * f0.astype(jnp.bfloat16), gp


def _gather_bands(bstarts_ref, bounds_ref, sflags_ref, row3, feat_ref,
                  wslice, stacked, obuf, gacc, osem, *, step, ws, tile, band,
                  chunkw, cin, c3p, pack2=False):
    """Band-gather phases for ONE δz-group whose window is already resident
    in `wslice` (starting at input row `ws`): phase-1 one-hot matmuls into
    gacc slots, phase-2 flag-masked tap stores into `stacked`, plus the
    rare per-step escape fallback. Shared by the (tile, group) grid and the
    group-merged grid.

    The per-band body is BRANCHLESS: each band does ONE [2·band, 128]
    one-hot matmul against a double-width window slice — rows outside the
    slice simply miss the one-hot (zero columns), and not-found taps are
    zeroed by the flag masking in `_taps_band`. Crucially the escape-hatch
    DMA loop is NOT in the per-band body: a conditional containing a DMA
    inside the band loop costs ~3µs per band in Mosaic pipeline
    serialization EVEN WHEN NEVER TAKEN (measured: 7.2 → 2.95 ms/layer at
    Waymo s0 scale just by removing it). Instead `_prep` precomputes one
    per-STEP flag saying whether ANY band of the step escapes its slice;
    the whole fallback pass sits behind that single scalar branch and
    reruns only the escaping bands (p99+ of steps skip it entirely)."""
    nb = tile // 128
    cover = 2 * band
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (cover, 128), 0)

    def band_scalars(j, b):
        bidx = (step * 3 + j) * nb + b
        enc = bstarts_ref[bidx]  # bstart·16-aligned | found-flag (bit 0)
        qs = pl.multiple_of(enc - (enc & 15), 16)
        bound = bounds_ref[bidx]  # upper bound on max(pos_b) + 1
        return qs, bound

    shift = 4 if pack2 else 3

    def store_taps(j, b, cols):
        gvals = gacc[j * nb + b]
        if pack2:
            parity = ((cols >> 3) & 1) > 0  # [1, 128]
            c3 = 3 * cin
            gvals = jnp.where(parity, gvals[c3 : 2 * c3], gvals[0:c3])
        gm, g0, gp = _taps_band(gvals, cols, cin)
        srow = j * 3 * cin
        sl = pl.ds(b * 128, 128)
        stacked[srow : srow + cin, sl] = gm
        stacked[srow + cin : srow + 2 * cin, sl] = g0
        stacked[srow + 2 * cin : srow + 3 * cin, sl] = gp

    # skip entirely-empty steps (every band flagless — common in the
    # capacity-padding tail of the later stages): just zero the stacked
    # buffer. The branch holds no DMA, so its presence is cheap.
    @pl.when(sflags_ref[step] < 2)
    def _():
        stacked[:] = jnp.zeros_like(stacked)

    @pl.when(sflags_ref[step] >= 2)
    def _():
        # phase 1: ALL band one-hot matmuls back-to-back into per-band gacc
        # slots — interleaving each matmul with its VPU tap-masking (the
        # old structure) ping-pongs MXU↔VPU and pays the MXU drain latency
        # per matmul; consecutive issue lets Mosaic pipeline the drains.
        for j in range(3):  # δy pairs in this group (static)
            for b in range(nb):  # bands (static)
                cols = row3[j : j + 1, b * 128 : (b + 1) * 128]  # [1, 128]
                pos_b = cols >> shift
                qs, _ = band_scalars(j, b)

                off = jnp.clip(qs - ws, 0, chunkw - cover)
                off = pl.multiple_of(off, 16)
                # one-hot relative to the slice actually loaded: when the
                # band escapes the slice, rel falls outside [0, cover) and
                # the column is zero — no masking branch needed
                rel = pos_b - (ws + off)
                oh = (q_ids == rel).astype(jnp.bfloat16)
                wband = wslice[pl.ds(off, cover), :]
                gacc[j * nb + b] = jax.lax.dot_general(
                    wband, oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        # phase 2: flag-mask the gathered taps into the stacked buffer
        for j in range(3):
            for b in range(nb):
                cols = row3[j : j + 1, b * 128 : (b + 1) * 128]
                store_taps(j, b, cols)

    # rare per-step fallback pass: rerun the bands whose input spread
    # escaped the double-width in-window slice (flag precomputed in _prep)
    @pl.when((sflags_ref[step] & 1) > 0)
    def _():
        for j in range(3):
            for b in range(nb):
                cols = row3[j : j + 1, b * 128 : (b + 1) * 128]
                pos_b = cols >> shift
                qs, bound = band_scalars(j, b)
                covered = (qs - ws >= 0) & (qs - ws <= chunkw - cover) & (
                    bound - qs <= cover
                )

                @pl.when(jnp.logical_not(covered))
                def _(cols=cols, pos_b=pos_b, qs=qs, bound=bound, j=j, b=b):
                    slot = j * nb + b
                    gacc[slot] = jnp.zeros((c3p, 128), jnp.float32)
                    novf = (bound - qs + cover - 1) // cover

                    def ovf(k, _):
                        rs = pl.multiple_of(qs + k * cover, 16)
                        dma = pltpu.make_async_copy(
                            feat_ref.at[pl.ds(rs, cover), :], obuf, osem
                        )
                        dma.start()
                        dma.wait()
                        oh2 = (q_ids == (pos_b - rs)).astype(jnp.bfloat16)
                        gacc[slot] += jax.lax.dot_general(
                            obuf[:], oh2, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        return 0

                    jax.lax.fori_loop(0, novf, ovf, 0)
                    store_taps(j, b, cols)


def _gather_group(wstarts_ref, bstarts_ref, bounds_ref, sflags_ref, row3,
                  feat_ref, stacked, wbuf, obuf, gacc, wsems, osem, *,
                  i, g, n_steps, tile, band, chunkw, cin, c3p, n_groups=3,
                  pack2=False):
    """Gather the three δy pairs of δz-group `g` for tile `i` and store the
    masked tap blocks into `stacked` (rows ordered (pair, tap, channel)).

    Window for step s=(i·G+g) was DMA'd into wbuf[s%2] by the previous
    step; this step prefetches step s+1's window. Band phases in
    `_gather_bands`."""
    step = i * n_groups + g
    cur = jax.lax.rem(step, 2)

    def win_dma(slot, start):
        start = pl.multiple_of(start, 16)
        return pltpu.make_async_copy(
            feat_ref.at[pl.ds(start, chunkw), :], wbuf.at[slot], wsems.at[slot]
        )

    @pl.when(step == 0)
    def _():
        win_dma(0, wstarts_ref[0]).start()

    @pl.when(step + 1 < n_steps)
    def _():
        win_dma(1 - cur, wstarts_ref[step + 1]).start()

    ws = wstarts_ref[step]
    win_dma(cur, ws).wait()
    _gather_bands(bstarts_ref, bounds_ref, sflags_ref, row3, feat_ref,
                  wbuf.at[cur], stacked, obuf, gacc, osem, step=step, ws=ws,
                  tile=tile, band=band, chunkw=chunkw, cin=cin, c3p=c3p,
                  pack2=pack2)


# ---------------------------------------------------------------------------
# forward / d_features kernel:  out[v] = Σ_p Σ_δ found·f[row(p,δ,v)] @ W[p,δ]
# ---------------------------------------------------------------------------


def _fwd_kernel(wstarts_ref, bstarts_ref, bounds_ref, sflags_ref, packed_ref,
                w_ref, feat_ref, out_ref, *rest, cin: int, band: int,
                chunkw: int, c3p: int, n_steps: int, n_groups: int = 3,
                pack2: bool = False, emit: bool = False):
    if emit:
        st_out_ref, wbuf, obuf, gacc, stacked, wsems, osem = rest
    else:
        wbuf, obuf, gacc, stacked, wsems, osem = rest
    i = pl.program_id(0)
    g = pl.program_id(1)
    tile = out_ref.shape[0]

    @pl.when(g == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    row3 = packed_ref[0]  # [3, T] (block = this group's 3 pair rows)
    _gather_group(wstarts_ref, bstarts_ref, bounds_ref, sflags_ref, row3,
                  feat_ref, stacked, wbuf, obuf, gacc, wsems, osem, i=i, g=g,
                  n_steps=n_steps, tile=tile, band=band, chunkw=chunkw,
                  cin=cin, c3p=c3p, n_groups=n_groups, pack2=pack2)

    wsl = pl.multiple_of(g * 9 * cin, 16)
    out_ref[:] += jax.lax.dot_general(
        stacked[:], w_ref[pl.ds(wsl, 9 * cin), :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, O]
    if emit:
        st_out_ref[:] = stacked[:]


def _fwd_kernel_g3(wstarts_ref, bstarts_ref, bounds_ref, sflags_ref,
                   packed_ref, w_ref, feat_ref, out_ref, *rest, cin: int,
                   band: int, chunkw: int, c3p: int, n_steps: int,
                   n_groups: int = 3, pack2: bool = False,
                   emit: bool = False):
    """Group-merged forward: one grid step processes ALL δz-groups of a
    tile. The (tile, group) grid pays a ~2.6 µs fixed cost per step
    (pipeline bubbles, branch setup, window-DMA wait chains — the s0 conv's
    705 steps ran at that floor in the round-3 device trace); merging the
    groups cuts the step count 3× at the price of G-buffered windows.
    Gated to cin ≤ 64 where the extra window VMEM fits comfortably."""
    if emit:
        st_out_ref, wbuf, obuf, gacc, stacked, wsems, osem = rest
    else:
        wbuf, obuf, gacc, stacked, wsems, osem = rest
    i = pl.program_id(0)
    nt = n_steps // n_groups
    tile = out_ref.shape[0]
    cur = jax.lax.rem(i, 2)

    def win_dma(slot, g, start):
        start = pl.multiple_of(start, 16)
        return pltpu.make_async_copy(
            feat_ref.at[pl.ds(start, chunkw), :], wbuf.at[slot, g],
            wsems.at[slot, g],
        )

    @pl.when(i == 0)
    def _():
        for g in range(n_groups):
            win_dma(0, g, wstarts_ref[g]).start()

    @pl.when(i + 1 < nt)
    def _():
        for g in range(n_groups):
            win_dma(1 - cur, g, wstarts_ref[(i + 1) * n_groups + g]).start()

    out_ref[:] = jnp.zeros_like(out_ref)
    for g in range(n_groups):
        step = i * n_groups + g
        ws = wstarts_ref[step]
        win_dma(cur, g, ws).wait()
        _gather_bands(bstarts_ref, bounds_ref, sflags_ref, packed_ref[g],
                      feat_ref, wbuf.at[cur, g], stacked, obuf, gacc, osem,
                      step=step, ws=ws, tile=tile, band=band, chunkw=chunkw,
                      cin=cin, c3p=c3p, pack2=pack2)
        wsl = pl.multiple_of(g * 9 * cin, 16)
        out_ref[:] += jax.lax.dot_general(
            stacked[:], w_ref[pl.ds(wsl, 9 * cin), :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, O]
        if emit:
            st_out_ref[pl.ds(wsl, 9 * cin), :] = stacked[:]


def _feat3(features: jax.Array, vpad: int, pack2: bool = False) -> jax.Array:
    """[V, C] → [vpad, 3C_pad128] bf16 with feat3[v] = (f[v-1], f[v], f[v+1]),
    lane-padded to a 128 multiple (HBM window DMAs need 128-aligned lanes).

    pack2 (3C ≤ 64, e.g. C=16): two consecutive rows share one lane-row —
    [vpad, 2·3C_pad128], halving window-DMA traffic and one-hot FLOPs; the
    kernel parity-selects the half per output column. `vpad` counts PACKED
    rows in that case."""
    v, c = features.shape
    f = features.astype(jnp.bfloat16)
    fm = jnp.concatenate([jnp.zeros((1, c), f.dtype), f[:-1]], axis=0)
    fp = jnp.concatenate([f[1:], jnp.zeros((1, c), f.dtype)], axis=0)
    f3 = jnp.concatenate([fm, f, fp], axis=1)
    if pack2:
        if v % 2:
            f3 = jnp.pad(f3, ((0, 1), (0, 0)))
        f3 = f3.reshape(-(-v // 2), 6 * c)
        return jnp.pad(
            f3, ((0, vpad - f3.shape[0]), (0, _rup(6 * c, 128) - 6 * c))
        )
    return jnp.pad(f3, ((0, vpad - v), (0, _rup(3 * c, 128) - 3 * c)))


def _prep(packed, v_pos, tile, band, chunkw, pos_shift=3):
    """Pad the packed rulebook to a tile multiple; compute per-(tile, group)
    window starts, per-(tile, group, pair, band) band starts (16-aligned),
    and the per-step fallback flags (any band escaping its double-width
    in-window slice — the kernel's rare slow path).

    `v_pos` = number of INPUT rows (the range of `pos` values; equals the
    rulebook width for SubM convs, differs for strided convs). Pairs are
    grouped in threes: P = 3·n_groups (9 for k=3³ convs, 3 for (3,1,1))."""
    nP = packed.shape[0]
    n_groups = nP // 3
    assert nP == 3 * n_groups
    v = packed.shape[1]
    vt = _rup(v, tile)
    if vt != v:
        packed = jnp.pad(
            packed, ((0, 0), (0, vt - v)), constant_values=v_pos << pos_shift
        )
    nb = tile // 128
    nt = vt // tile
    # lane-0 extraction as a masked reduce: the literal strided slice
    # packed[:, ::128] lowers to a lane-granular gather (~2 ms per prep at
    # s0 scale in the device trace); a full-read masked max vectorizes
    p3 = packed.reshape(packed.shape[0], -1, 128)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2) == 0
    pos128 = jnp.max(jnp.where(lane0, p3, 0), axis=-1) >> pos_shift
    bstarts = (pos128 // 16) * 16  # [P, nT*nb]
    # per-band found flag (bit 0 of the encoded start)
    flags = (
        jnp.max((packed & 7).reshape(packed.shape[0], -1, 128), axis=-1) > 0
    ).astype(jnp.int32)  # [P, nT*nb]
    enc = bstarts + flags
    # upper bound on max(pos) within each band: next band's first pos + 16
    nxt = jnp.concatenate(
        [pos128[:, 1:], jnp.full((packed.shape[0], 1), v_pos, jnp.int32)], axis=1
    )
    bounds = nxt + 16
    # band order (i, g, j, b): [P=3·G, nT, nb] -> [nT, G, 3, nb]
    def reorder(a):
        return (
            a.reshape(n_groups, 3, nt, nb).transpose(2, 0, 1, 3).reshape(-1)
        ).astype(jnp.int32)

    enc, bounds = reorder(enc), reorder(bounds)
    # window start per (tile, group) = min over the 3 pairs' tile starts
    tstart = pos128[:, ::nb].reshape(n_groups, 3, nt)  # [g, j, nT]
    wstarts = ((jnp.min(tstart, axis=1) // 16) * 16).T.reshape(-1)  # [nT*G]
    # per-step fallback flag: any band with start outside the window or
    # spread beyond the double-width slice
    cover = 2 * band
    qs = (enc.reshape(-1, 3 * nb) // 16) * 16
    bnd = bounds.reshape(-1, 3 * nb)
    wsb = wstarts[:, None]
    fnd = (enc.reshape(-1, 3 * nb) & 1) > 0
    esc = ((qs < wsb) | (qs > wsb + (chunkw - cover)) | (bnd - qs > cover)) & fnd
    # bit 0: any band escapes (fallback pass); bit 1: any band has found
    # taps (else the whole step's gather work is skipped)
    sflags = (
        jnp.any(esc, axis=1).astype(jnp.int32)
        + 2 * jnp.any(fnd, axis=1).astype(jnp.int32)
    )  # [nT*G]
    # [G groups, 3 pairs, vt] so the kernel can block-load one group's rows
    packed = packed.reshape(n_groups, 3, vt)
    return packed, wstarts.astype(jnp.int32), enc, bounds, sflags, vt


@struct.dataclass
class PreppedRule:
    """A packed rulebook with its kernel-side derived arrays precomputed.

    The per-call `_prep` + pack2 transform cost ~0.5 ms per V=240k call and
    ran inside EVERY fused kernel invocation (12+ per stage per step —
    XLA does not CSE them across pallas_call boundaries; measured ~59
    ms/step of s32 structure fusions in the device trace). Prepping once
    per stage via `prep_rulebook` and passing this struct removes that."""

    packed: jax.Array  # [G, 3, vt] (pack2-transformed when pack2)
    wstarts: jax.Array
    bstarts: jax.Array
    bounds: jax.Array
    sflags: jax.Array
    raw: jax.Array  # original [P, V_out] anchor rulebook
    v_out: int = struct.field(pytree_node=False)
    v_pos: int = struct.field(pytree_node=False)  # packed-unit input rows
    vt: int = struct.field(pytree_node=False)
    tile: int = struct.field(pytree_node=False)
    band: int = struct.field(pytree_node=False)
    chunkw: int = struct.field(pytree_node=False)
    pack2: bool = struct.field(pytree_node=False)
    n_groups: int = struct.field(pytree_node=False)


def _tile_for(cin_padded: int, tile: int, n_groups: int = 3) -> int:
    """VMEM-budget tile clamp: the window/accumulator scratch scales with
    c3p = 3·cin and tile (gacc 3·(tile/128)·c3p·128·f32 + wbuf
    2·(tile+wslack)·c3p·bf16 + stacked 9·cin·tile·bf16 + out tile·cout·f32).
    At cin=256 the default TILE=1024 needs ~24MB > the 16MB scoped limit
    (hit by ConQueR's res4); halve the tile for wide channels.

    The emit variant additionally holds the stacked residual output block
    [n_groups·9·cin, tile] bf16 on the kernel stack — the strided-conv
    INVERSE rulebook carries n_groups=6, which at cin=128, tile=1024 is a
    14.2MB block alone (scoped-vmem OOM at 16.38M/16M, ConQueR res3 down,
    r5); clamp so that block stays ≤ 8MB."""
    if cin_padded > 192:
        tile = min(tile, 256)
    elif cin_padded > 128:
        tile = min(tile, 512)
    while tile > 256 and n_groups * 9 * cin_padded * tile * 2 > 8 * 2**20:
        tile //= 2
    return tile


def prep_rulebook(
    packed: jax.Array,  # [P=3·G, V_out] anchor rulebook
    v_in: int,  # input rows (the range of pos values)
    cin: int,  # channel count of the gathered features (pre-16-padding ok)
    *,
    tile: int = TILE,
    band: int = BAND,
    wslack: int = WSLACK,
) -> PreppedRule:
    cin = _rup(max(cin, 1), 16)
    n_groups = packed.shape[0] // 3
    tile = _tile_for(cin, tile, n_groups)
    raw = packed
    v_out = packed.shape[1]
    pack2 = 3 * cin <= 64
    if pack2:  # halve band/window (they count PACKED rows)
        band = _rup(max(band // 2, 32), 16)
        wslack = _rup(max(wslack // 2, 64), 16)
        pos = packed >> 3
        packed = (pos >> 1) * 16 + (pos & 1) * 8 + (packed & 7)
        v_pos = -(-v_in // 2)
    else:
        v_pos = v_in
    chunkw = tile + wslack
    packed, wstarts, bstarts, bounds, sflags, vt = _prep(
        packed, v_pos, tile, band, chunkw, pos_shift=4 if pack2 else 3
    )
    # materialize ONCE: without the barrier XLA duplicates these cheap s32
    # producer chains (and the expensive table gathers feeding them) into
    # every consumer fusion across the 12+ kernel calls of a stage
    # (measured ~35 extra s32[V] fusions per step in the device trace)
    packed, wstarts, bstarts, bounds, sflags = jax.lax.optimization_barrier(
        (packed, wstarts, bstarts, bounds, sflags)
    )
    return PreppedRule(
        packed=packed, wstarts=wstarts, bstarts=bstarts, bounds=bounds,
        sflags=sflags, raw=raw, v_out=v_out, v_pos=v_pos, vt=vt, tile=tile,
        band=band, chunkw=chunkw, pack2=pack2, n_groups=n_groups,
    )


def feat3_of(rule: "PreppedRule", features: jax.Array) -> jax.Array:
    """The rule-shaped shifted-concat gather source for `features` — built
    once per layer and shared by the fwd and dW kernels (each call used to
    rebuild it: ~0.3-0.5 ms × 2 per layer at s0 scale)."""
    return _feat3(
        features, rule.v_pos + rule.chunkw + 2 * rule.band + 32,
        pack2=rule.pack2,
    )


@functools.partial(
    jax.jit, static_argnames=("tile", "band", "wslack", "emit_stacked")
)
def fused_gather_gemm(
    features: jax.Array,  # [V_in, C]
    rule,  # PreppedRule, or a raw [P=3·G, V_out] int32 anchor rulebook
    weights: jax.Array,  # [P·3·C, O] rows ordered (pair, tap, channel)
    feat3: jax.Array | None = None,  # optional precomputed feat3_of(rule, features)
    *,
    tile: int = TILE,
    band: int = BAND,
    wslack: int = WSLACK,
    emit_stacked: bool = False,
) -> jax.Array:
    """out [V_out, O] f32 = the packed-rulebook sparse-conv contraction,
    fused in Pallas. V_in == V_out for SubM convs; for strided convs the
    rulebook indexes the input rows from the output sites.

    emit_stacked=True additionally returns the gathered tap buffer
    [P·3·C, vt] bf16 (rows (pair, tap, channel), flag-masked). The backward
    pass uses it to turn dW into ONE dense GEMM instead of re-running the
    whole gather (the dW kernel cost ≈ a full forward): by rulebook
    symmetry dW[κ] = Σ_u f[u]·stacked_g[flip(κ), u] where stacked_g is the
    d_features pass's gather of the output grads."""
    v_in, cin = features.shape
    # re-prep when the rule's derived layout doesn't fit THIS gather's
    # channel count: pack2 mismatch, or a tile prepped for narrow channels
    # exceeding the wide-channel VMEM clamp (e.g. a cin<=128 rule reused
    # by the backward pass to gather cout=256 grads)
    if (not isinstance(rule, PreppedRule)
            or rule.pack2 != (3 * _rup(cin, 16) <= 64)
            or rule.tile > _tile_for(_rup(cin, 16), rule.tile)):
        raw = rule.raw if isinstance(rule, PreppedRule) else rule
        rule = prep_rulebook(raw, v_in, cin, tile=tile, band=band, wslack=wslack)
    cout = weights.shape[1]
    packed, wstarts, bstarts, bounds, sflags = (
        rule.packed, rule.wstarts, rule.bstarts, rule.bounds, rule.sflags
    )
    v_out, v_pos, vt = rule.v_out, rule.v_pos, rule.vt
    tile, band, chunkw, pack2 = rule.tile, rule.band, rule.chunkw, rule.pack2
    n_groups = rule.n_groups
    if feat3 is None:
        feat3 = _feat3(features, v_pos + chunkw + 2 * band + 32, pack2=pack2)
    c3p = feat3.shape[1]
    n_steps = (vt // tile) * n_groups

    # group-merged grid: 3× fewer steps (per-step fixed cost floor); VMEM
    # gate — the G window buffers only fit comfortably at narrow channels
    g3 = _G3 and cin <= 64 and n_groups >= 2
    out_shape = jax.ShapeDtypeStruct((vt, cout), jnp.float32)
    if g3:
        out_specs = pl.BlockSpec((tile, cout), lambda i, *_: (i, 0))
        if emit_stacked:
            out_specs = [
                out_specs,
                pl.BlockSpec(
                    (n_groups * 9 * cin, tile), lambda i, *_: (0, i)
                ),
            ]
        grid = (vt // tile,)
        packed_spec = pl.BlockSpec(
            (n_groups, 3, tile), lambda i, *_: (0, 0, i)
        )
        wbuf_shape = pltpu.VMEM((2, n_groups, chunkw, c3p), jnp.bfloat16)
        wsem_shape = pltpu.SemaphoreType.DMA((2, n_groups))
        kern = _fwd_kernel_g3
    else:
        out_specs = pl.BlockSpec((tile, cout), lambda i, g, *_: (i, 0))
        if emit_stacked:
            out_specs = [
                out_specs,
                pl.BlockSpec((9 * cin, tile), lambda i, g, *_: (g, i)),
            ]
        grid = (vt // tile, n_groups)
        packed_spec = pl.BlockSpec((1, 3, tile), lambda i, g, *_: (g, 0, i))
        wbuf_shape = pltpu.VMEM((2, chunkw, c3p), jnp.bfloat16)
        wsem_shape = pltpu.SemaphoreType.DMA((2,))
        kern = _fwd_kernel
    if emit_stacked:
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((n_groups * 9 * cin, vt), jnp.bfloat16),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            packed_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights [P·3·C, O]
            pl.BlockSpec(memory_space=pl.ANY),  # feat3 stays in HBM
        ],
        out_specs=out_specs,
        scratch_shapes=[
            wbuf_shape,
            pltpu.VMEM((2 * band, c3p), jnp.bfloat16),
            pltpu.VMEM((3 * (tile // 128), c3p, 128), jnp.float32),
            pltpu.VMEM((9 * cin, tile), jnp.bfloat16),
            wsem_shape,
            pltpu.SemaphoreType.DMA,
        ],
    )
    res = pl.pallas_call(
        functools.partial(kern, cin=cin, band=band, chunkw=chunkw,
                          c3p=c3p, n_steps=n_steps, n_groups=n_groups,
                          pack2=pack2, emit=emit_stacked),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(wstarts, bstarts, bounds, sflags, packed,
      weights.astype(jnp.bfloat16), feat3)
    if emit_stacked:
        return res[0][:v_out], res[1]
    return res[:v_out]


# ---------------------------------------------------------------------------
# dW kernel:  dW = Σ_tiles stacked(tile) @ g(tile)
# ---------------------------------------------------------------------------


def _dw_kernel(wstarts_ref, bstarts_ref, bounds_ref, sflags_ref, packed_ref,
               g_ref, feat_ref, dw_ref, wbuf, obuf, gacc, stacked, wsems,
               osem, *, cin: int, band: int, chunkw: int, c3p: int,
               n_steps: int, n_groups: int = 3, pack2: bool = False):
    i = pl.program_id(0)
    g = pl.program_id(1)
    tile = g_ref.shape[0]

    @pl.when((i == 0) & (g == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    row3 = packed_ref[0]  # [3, T]
    _gather_group(wstarts_ref, bstarts_ref, bounds_ref, sflags_ref, row3,
                  feat_ref, stacked, wbuf, obuf, gacc, wsems, osem, i=i, g=g,
                  n_steps=n_steps, tile=tile, band=band, chunkw=chunkw,
                  cin=cin, c3p=c3p, n_groups=n_groups, pack2=pack2)

    wsl = pl.multiple_of(g * 9 * cin, 16)
    dw_ref[pl.ds(wsl, 9 * cin), :] += jax.lax.dot_general(
        stacked[:], g_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [9C, O]


@functools.partial(jax.jit, static_argnames=("tile", "band", "wslack"))
def fused_gather_dw(
    features: jax.Array,  # [V_in, C]
    rule,  # PreppedRule, or a raw [P=3·G, V_out] int32 anchor rulebook
    g: jax.Array,  # [V_out, O] upstream grad (pre-masked by out_valid)
    feat3: jax.Array | None = None,  # optional precomputed feat3_of(rule, features)
    *,
    tile: int = TILE,
    band: int = BAND,
    wslack: int = WSLACK,
) -> jax.Array:
    """dW [P·3·C, O] f32 for the packed contraction (rows (pair, tap, c))."""
    v_in, cin = features.shape
    # re-prep when the rule's derived layout doesn't fit THIS gather's
    # channel count: pack2 mismatch, or a tile prepped for narrow channels
    # exceeding the wide-channel VMEM clamp (e.g. a cin<=128 rule reused
    # by the backward pass to gather cout=256 grads)
    if (not isinstance(rule, PreppedRule)
            or rule.pack2 != (3 * _rup(cin, 16) <= 64)
            or rule.tile > _tile_for(_rup(cin, 16), rule.tile)):
        raw = rule.raw if isinstance(rule, PreppedRule) else rule
        rule = prep_rulebook(raw, v_in, cin, tile=tile, band=band, wslack=wslack)
    cout = g.shape[1]
    packed, wstarts, bstarts, bounds, sflags = (
        rule.packed, rule.wstarts, rule.bstarts, rule.bounds, rule.sflags
    )
    v_out, v_pos, vt = rule.v_out, rule.v_pos, rule.vt
    tile, band, chunkw, pack2 = rule.tile, rule.band, rule.chunkw, rule.pack2
    n_groups = rule.n_groups
    if vt != v_out:
        g = jnp.pad(g, ((0, vt - v_out), (0, 0)))
    if feat3 is None:
        feat3 = _feat3(features, v_pos + chunkw + 2 * band + 32, pack2=pack2)
    c3p = feat3.shape[1]
    n_steps = (vt // tile) * n_groups

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(vt // tile, n_groups),
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda i, g, *_: (g, 0, i)),
            pl.BlockSpec((tile, cout), lambda i, g, *_: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (3 * n_groups * 3 * cin, cout), lambda i, g, *_: (0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunkw, c3p), jnp.bfloat16),
            pltpu.VMEM((2 * band, c3p), jnp.bfloat16),
            pltpu.VMEM((3 * (tile // 128), c3p, 128), jnp.float32),
            pltpu.VMEM((9 * cin, tile), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, cin=cin, band=band, chunkw=chunkw,
                          c3p=c3p, n_steps=n_steps, n_groups=n_groups,
                          pack2=pack2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3 * n_groups * 3 * cin, cout), jnp.float32),
        interpret=_INTERPRET,
    )(wstarts, bstarts, bounds, sflags, packed, g, feat3)
    return dw


# ---------------------------------------------------------------------------
# public op with custom VJP (SubM convs: input and output sites coincide)
# ---------------------------------------------------------------------------


def subm_conv9(
    features: jax.Array,  # [V, C]
    packed,  # PreppedRule or [9, V] int32 anchor rulebook
    weights: jax.Array,  # [K = 27, C, O] in (pair, δx) raster order
    out_valid: jax.Array,  # [V] bool
) -> jax.Array:
    """Fused SubM rule9 conv, out [V, O].

    `weights` uses the same [K, C, O] layout `sparse.gather_gemm9` takes.
    Channels are padded to a multiple of 16 (bf16 sublane-aligned tap
    blocks in the stacked gather buffer).

    Backward: d_features is ANOTHER fused_gather_gemm with jointly flipped
    (pair, tap) weights (the 27-raster reversal, identical to
    `sparse.gather_gemm9`'s bwd); dW is the dedicated dW kernel.
    """
    k3, cin0, cout = weights.shape
    cin = _rup(cin0, 16)
    if cin != cin0:
        features = jnp.pad(features, ((0, 0), (0, cin - cin0)))
        weights = jnp.pad(weights, ((0, 0), (0, cin - cin0), (0, 0)))
    if not isinstance(packed, PreppedRule):
        packed = prep_rulebook(packed, features.shape[0], cin)

    @jax.custom_vjp
    def f(feats, w):
        return fused_gather_gemm(
            feats, packed, w.reshape(k3 * cin, cout)
        ) * out_valid[:, None].astype(jnp.float32)

    def fwd(feats, w):
        # NOTE: packed/out_valid/feat3 ride the residuals so the backward
        # region depends on them EXPLICITLY — left as closure captures,
        # XLA's scheduler rematerialized the entire rulebook build inside
        # the loop body (~0.5 ms × dozens per step, device trace) instead
        # of keeping ~1 MB live. feat3 is shared by the fwd and dW kernels
        # (each used to rebuild it).
        f3 = feat3_of(packed, feats)
        out = fused_gather_gemm(
            feats, packed, w.reshape(k3 * cin, cout), f3
        ) * out_valid[:, None].astype(jnp.float32)
        return out, (feats, w, packed, out_valid, f3)

    def bwd(res, g):
        feats, w, packed_r, ov, f3 = res
        g = g * ov[:, None].astype(g.dtype)
        # full 27-raster reversal = reverse pairs AND taps jointly
        w_flip = jnp.swapaxes(w[::-1], 1, 2)  # [K, O, C]
        if cout % 16 == 0:
            # d_features gather also emits its stacked tap buffer
            # stacked_g[κ·O+o, u] = found_κ(u)·ĝ[r_κ(u), o], which turns dW
            # into ONE dense MXU GEMM (the dedicated dW kernel re-ran the
            # entire gather ≈ a full forward). Change of variables
            # v = r_{flip(κ)}(u) in dW[κ] = Σ_v f[r_κ(v)]ᵀĝ[v] gives
            # dW[κ][c,o] = Σ_u f[u,c]·stacked_g[flip(κ)·O+o, u]; pad rows of
            # fpad are zero so flag-garbage in padding columns cancels.
            d_feats, stacked_g = fused_gather_gemm(
                g.astype(jnp.float32), packed_r,
                w_flip.reshape(k3 * cout, cin), emit_stacked=True,
            )
            d_feats = d_feats.astype(feats.dtype)
            vt = stacked_g.shape[1]
            fpad = jnp.pad(
                feats, ((0, vt - feats.shape[0]), (0, 0))
            ).astype(jnp.bfloat16)
            dw = jax.lax.dot_general(
                stacked_g, fpad, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [(κ', o), c] rows in κ' raster order
            dw = jnp.swapaxes(dw.reshape(k3, cout, cin)[::-1], 1, 2)
            return d_feats, dw.astype(w.dtype)
        d_feats = fused_gather_gemm(
            g.astype(jnp.float32), packed_r, w_flip.reshape(k3 * cout, cin)
        ).astype(feats.dtype)
        dw = fused_gather_dw(feats, packed_r, g.astype(jnp.float32), f3)
        dw = dw.reshape(k3, cin, cout).astype(w.dtype)
        return d_feats, dw

    f.defvjp(fwd, bwd)
    return f(features, weights)


# ---------------------------------------------------------------------------
# merge-join rank/flags kernel — the rulebook builders' core
# ---------------------------------------------------------------------------

# Query values at or above this threshold are treated as +inf (invalid /
# padding). Valid linear keys are < 2^28 at Waymo scale, and per-pair query
# deltas add < 2^23, so 2^29 is safely above every real query.
INVALID_Q = 1 << 29
_CLAMP_Q = 1 << 30  # canonical +inf value keys/queries are clamped to


def _rank_kernel(wrow_ref, nrows_ref, qT_ref, keys_ref, out_ref, *, nb: int):
    """Per band of 128 sorted queries: count keys < q and flag the presence
    of q−1 / q / q+1, scanning only the [wrow, wrow+nrows) key rows the
    host-side searchsorted bounded. All compares run VMEM→VPU as [128, 128]
    broadcast ops — no HBM gathers, no dense tables (the round-2 structure
    wall: ~190 table-gather passes ≈ 70 ms/step, re-run by XLA's
    rematerializer in the backward region; a custom-call is never remat'd).
    """
    t = pl.program_id(0)
    for b in range(nb):
        q = qT_ref[0, :, b : b + 1]  # [128, 1]
        base = wrow_ref[t * nb + b]
        nr = nrows_ref[t * nb + b]
        qm1 = q - 1
        qp1 = q + 1

        def body(r, accs, base=base, q=q, qm1=qm1, qp1=qp1):
            al, ae = accs
            k = keys_ref[pl.ds(base + r, 1), :]  # [1, 128]
            lt = (k < q).astype(jnp.int32)
            # eq fields: q−1 in bits 0..9, q in 10..19, q+1 in 20..29
            # (valid queries match ≤1 key; only +inf padding queries can
            # rack up counts, and their window is 1-2 rows → ≤ 256 < 1024)
            eq = (
                (k == qm1).astype(jnp.int32)
                + jnp.where(k == q, 1 << 10, 0)
                + jnp.where(k == qp1, 1 << 20, 0)
            )
            return al + lt, ae + eq

        zero = jnp.zeros((128, 128), jnp.int32)
        al, ae = jax.lax.fori_loop(0, nr, body, (zero, zero))
        cnt = base * 128 + jnp.sum(al, axis=1, keepdims=True)  # [128, 1]
        es = jnp.sum(ae, axis=1, keepdims=True)
        fm = jnp.minimum(es & 1023, 1)
        f0 = jnp.minimum((es >> 10) & 1023, 1)
        fp = jnp.minimum((es >> 20) & 1023, 1)
        out_ref[0, :, b : b + 1] = cnt * 8 + fm * 4 + f0 * 2 + fp


def _rank_kernel_seq(seeds_ref, rowmax_ref, qT_ref, keys_ref, out_ref, wpos,
                     aacc, *, nb: int, nt: int, kr: int):
    """Sequential-window variant of `_rank_kernel`: instead of host-side
    per-band searchsorted windows, the scan start is carried across bands
    in SMEM (queries are monotone per pair) and each band scans key chunks
    until the per-chunk max (prefetched `rowmax` = keys2d[:, 127], SMEM)
    passes its own max query + 1 — exact windows, zero host-side
    per-band work. `seeds` = searchsorted row of each pair's first query
    (one scalar per pair)."""
    t = pl.program_id(0)

    @pl.when(jax.lax.rem(t, nt) == 0)
    def _():
        wpos[0] = seeds_ref[t // nt]

    for b in range(nb):
        q = qT_ref[0, :, b : b + 1]  # [128, 1]
        qm1 = q - 1
        qp1 = q + 1
        qmax = qT_ref[0, 127, b]  # queries sorted: lane 127 is the band max
        qmax2 = qmax + 2
        start = wpos[0]

        def cond(carry, start=start, qmax2=qmax2):
            r, _, _ = carry
            prev_ok = (rowmax_ref[jnp.maximum(r - 1, 0)] < qmax2) & (
                rowmax_ref[jnp.maximum(r - 1, 0)] < _CLAMP_Q
            )
            return (r < kr) & ((r == start) | prev_ok)

        # accumulate into VMEM scratch so the while carry is scalars only
        # (two [128,128] vreg carries forced bank copies per iteration)
        aacc[0] = jnp.zeros((128, 128), jnp.int32)
        aacc[1] = jnp.zeros((128, 128), jnp.int32)

        def body(carry, q=q, qm1=qm1, qp1=qp1, qmax=qmax):
            r, rstar, seen = carry
            k = keys_ref[pl.ds(r, 1), :]  # [1, 128]
            lt = (k < q).astype(jnp.int32)
            eq = (
                (k == qm1).astype(jnp.int32)
                + jnp.where(k == q, 1 << 10, 0)
                + jnp.where(k == qp1, 1 << 20, 0)
            )
            aacc[0] += lt
            aacc[1] += eq
            hit = rowmax_ref[r] >= qmax
            rstar = jnp.where(seen | ~hit, rstar, r)
            return r + 1, rstar, seen | hit

        _, rstar, _ = jax.lax.while_loop(cond, body, (start, kr - 1, False))
        cnt = start * 128 + jnp.sum(aacc[0], axis=1, keepdims=True)  # [128, 1]
        es = jnp.sum(aacc[1], axis=1, keepdims=True)
        fm = jnp.minimum(es & 1023, 1)
        f0 = jnp.minimum((es >> 10) & 1023, 1)
        fp = jnp.minimum((es >> 20) & 1023, 1)
        out_ref[0, :, b : b + 1] = cnt * 8 + fm * 4 + f0 * 2 + fp
        # next band starts at the first chunk whose max reached this band's
        # max query: everything before it is < every later query
        wpos[0] = rstar


def _rank_kernel_seq4(seeds_ref, rowmax_ref, qT_ref, keys_ref, out_ref, wpos,
                      aacc, *, nb: int, nt: int, kr4: int):
    """`_rank_kernel_seq` with a 4×128-lane (512-key) super-chunk body: the
    while loop that dominated the rank kernels' runtime (~36 ms/step of the
    round-3 device trace was merge_rank_flags calls; most bands scan 2-3
    128-key chunks, each paying scalar loop control + a [128,128] VMEM
    accumulator round-trip) now usually runs ONE iteration, compares
    [128, 512] wide, and accumulates [128, 1] reductions instead of raw
    compare planes. Window-skip correctness relies on strictly-increasing
    valid queries per pair (distinct voxel/site keys + constant Δ), same as
    the 128-wide variant."""
    t = pl.program_id(0)

    @pl.when(jax.lax.rem(t, nt) == 0)
    def _():
        wpos[0] = seeds_ref[t // nt]

    for b in range(nb):
        q = qT_ref[0, :, b : b + 1]  # [128, 1]
        qm1 = q - 1
        qp1 = q + 1
        qmax = qT_ref[0, 127, b]  # queries sorted: lane 127 is the band max
        qmax2 = qmax + 2
        start = wpos[0]

        def cond(carry, start=start, qmax2=qmax2):
            r, _, _ = carry
            prev_ok = (rowmax_ref[jnp.maximum(r - 1, 0)] < qmax2) & (
                rowmax_ref[jnp.maximum(r - 1, 0)] < _CLAMP_Q
            )
            return (r < kr4) & ((r == start) | prev_ok)

        aacc[0] = jnp.zeros((128, 1), jnp.int32)
        aacc[1] = jnp.zeros((128, 1), jnp.int32)

        def body(carry, q=q, qm1=qm1, qp1=qp1, qmax=qmax):
            r, rstar, seen = carry
            k = keys_ref[pl.ds(r, 1), :]  # [1, 512]
            lt = (k < q).astype(jnp.int32)
            eq = (
                (k == qm1).astype(jnp.int32)
                + jnp.where(k == q, 1 << 10, 0)
                + jnp.where(k == qp1, 1 << 20, 0)
            )
            aacc[0] += jnp.sum(lt, axis=1, keepdims=True)
            aacc[1] += jnp.sum(eq, axis=1, keepdims=True)
            hit = rowmax_ref[r] >= qmax
            rstar = jnp.where(seen | ~hit, rstar, r)
            return r + 1, rstar, seen | hit

        _, rstar, _ = jax.lax.while_loop(cond, body, (start, kr4 - 1, False))
        cnt = start * 512 + aacc[0]  # [128, 1]
        es = aacc[1]
        fm = jnp.minimum(es & 1023, 1)
        f0 = jnp.minimum((es >> 10) & 1023, 1)
        fp = jnp.minimum((es >> 20) & 1023, 1)
        out_ref[0, :, b : b + 1] = cnt * 8 + fm * 4 + f0 * 2 + fp
        wpos[0] = rstar


def merge_rank_flags(keys: jax.Array, queries: jax.Array, *, nb: int = 8,
                     seq: bool = True):
    """keys [Vk] i32 sorted ascending (entries ≥ INVALID_Q = padding);
    queries [P, Vq] i32, non-decreasing per row (≥ INVALID_Q = padding).
    Returns packed [P, Vq] i32 = count(valid keys < q)·8 + (q−1∈keys)·4 +
    (q∈keys)·2 + (q+1∈keys)·1. Flags at padding queries are garbage — the
    caller masks them. `count` is exactly searchsorted-left, monotone per
    row, so the result is a valid anchor-format rulebook row.

    `seq=True` (default): impl picked by EFG_RANK_IMPL (seq4/seq);
    `seq=False`: per-band windows from a host searchsorted (hostwin).
    Impl is resolved HERE (not inside the jitted core) so monkeypatching
    the module global retraces instead of hitting a stale jit cache.

    A straight-line "flat" variant (host-seeded static nr-row windows, no
    in-kernel loop control) was built and measured on TPU 2026-08-19: 14.2
    ms vs seq's 10.5 ms at the stage-0 Waymo shape — per-band loop CONTROL
    is not the dominant cost, so the variant was deleted."""
    impl = _RANK_IMPL if seq else "hostwin"
    return _merge_rank_flags_impl(keys, queries, nb=nb, impl=impl)


@functools.partial(jax.jit, static_argnames=("nb", "impl"))
def _merge_rank_flags_impl(keys: jax.Array, queries: jax.Array, *, nb: int,
                           impl: str):
    if impl not in ("seq", "seq4", "hostwin"):
        raise ValueError(
            f"EFG_RANK_IMPL={impl!r}: expected one of 'seq', 'seq4', 'hostwin'"
        )
    vk = keys.shape[0]
    p, vq = queries.shape
    keys_c = jnp.minimum(keys, _CLAMP_Q)
    kr = _cdiv(vk, 128)
    keys2d = jnp.pad(
        keys_c, (0, kr * 128 - vk), constant_values=_CLAMP_Q
    ).reshape(kr, 128)
    tile = nb * 128
    vqp = _rup(vq, tile)
    qp = jnp.pad(
        jnp.where(queries >= INVALID_Q, _CLAMP_Q, queries),
        ((0, 0), (0, vqp - vq)),
        constant_values=_CLAMP_Q,
    )
    nt = vqp // tile
    nbands = vqp // 128
    qT = qp.reshape(p, nt, nb, 128).transpose(0, 1, 3, 2).reshape(p * nt, 128, nb)

    if impl == "seq4":
        # 512-key super-chunks: most bands resolve in ONE while iteration
        kr4 = _cdiv(vk, 512)
        keys2d4 = jnp.pad(
            keys_c, (0, kr4 * 512 - vk), constant_values=_CLAMP_Q
        ).reshape(kr4, 512)
        flat = keys2d4.reshape(-1)
        # −1: when the first query's insertion position is an exact chunk
        # multiple, its q−1 neighbor key sits at position−1 in the PREVIOUS
        # chunk — start one key earlier so the flag can't be missed
        seeds = (
            jnp.maximum(
                jnp.searchsorted(flat, qp[:, 0], side="left").astype(jnp.int32)
                - 1,
                0,
            )
            // 512
        )
        rowmax = keys2d4[:, 511]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(p * nt,),
            in_specs=[
                pl.BlockSpec((1, 128, nb), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # keys2d4 resident
            ],
            out_specs=pl.BlockSpec((1, 128, nb), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),
                pltpu.VMEM((2, 128, 1), jnp.int32),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_rank_kernel_seq4, nb=nb, nt=nt, kr4=kr4),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((p * nt, 128, nb), jnp.int32),
            interpret=_INTERPRET,
        )(seeds, rowmax, qT, keys2d4)
    elif impl == "seq":
        flat = keys2d.reshape(-1)
        seeds = (
            jnp.maximum(
                jnp.searchsorted(flat, qp[:, 0], side="left").astype(jnp.int32)
                - 1,
                0,
            )
            // 128
        )  # [p] — one scalar per pair (−1: see seq4 note on the q−1 flag)
        rowmax = keys2d[:, 127]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(p * nt,),
            in_specs=[
                pl.BlockSpec((1, 128, nb), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # keys2d resident
            ],
            out_specs=pl.BlockSpec((1, 128, nb), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),
                pltpu.VMEM((2, 128, 128), jnp.int32),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_rank_kernel_seq, nb=nb, nt=nt, kr=kr),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((p * nt, 128, nb), jnp.int32),
            interpret=_INTERPRET,
        )(seeds, rowmax, qT, keys2d)
    else:
        # per-band key-row windows from ONE vectorized searchsorted over
        # the band-start queries (P·Vq/128 queries ≈ 17k at Waymo s0)
        qs = qp[:, ::128]
        pos = (
            jnp.searchsorted(keys2d.reshape(-1), qs.reshape(-1), side="left")
            .astype(jnp.int32)
            .reshape(p, nbands)
        )
        nxt = jnp.concatenate(
            [pos[:, 1:], jnp.full((p, 1), kr * 128 - 1, jnp.int32)], axis=1
        )
        wrow = jnp.maximum(pos - 1, 0) // 128  # −1: see the seq4 q−1 note
        last = jnp.minimum((nxt + 1) // 128, kr - 1)
        nrows = jnp.maximum(last - wrow + 1, 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(p * nt,),
            in_specs=[
                pl.BlockSpec((1, 128, nb), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # keys2d resident
            ],
            out_specs=pl.BlockSpec((1, 128, nb), lambda i, *_: (i, 0, 0)),
        )
        out = pl.pallas_call(
            functools.partial(_rank_kernel, nb=nb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((p * nt, 128, nb), jnp.int32),
            interpret=_INTERPRET,
        )(wrow.reshape(-1), nrows.reshape(-1), qT, keys2d)
    packed = (
        out.reshape(p, nt, 128, nb).transpose(0, 1, 3, 2).reshape(p, vqp)[:, :vq]
    )
    return packed


# ---------------------------------------------------------------------------
# monotone rulebook builders (packed anchor format)
# ---------------------------------------------------------------------------


def build_monotone_rule9(st, kernel_size: int = 3) -> jax.Array:
    """SubM rulebook, packed anchor format: [P, V] int32 = pos·8 + fm·4 +
    f0·2 + fp, P = kd·kh, pos monotone in v per pair.

    Queries for pair (δz, δy) are `keys + Δ` (monotone), ranked against the
    sorted keys by the merge-join kernel; boundary masks (grid edges in
    z/y, x wrap) are applied to the flags afterwards — pos = searchsorted
    count is monotone everywhere by construction, no backfill needed.
    """
    kd, kh, kw = (kernel_size,) * 3 if isinstance(kernel_size, int) else kernel_size
    assert kw == 3
    d, h, w = st.spatial_shape
    x = st.coords[:, 3]

    # invalid rows → +inf tail; _CLAMP_Q (not INVALID_Q) so that adding a
    # negative Δ keeps the query ≥ INVALID_Q (still treated as padding)
    key_base = jnp.where(st.valid, st.keys, _CLAMP_Q)
    queries, masks = [], []
    center = None
    for dz in range(-(kd - 1) // 2, (kd - 1) // 2 + 1):
        for dy in range(-(kh - 1) // 2, (kh - 1) // 2 + 1):
            delta = (dz * h + dy) * w
            nz = st.coords[:, 1] + dz
            ny = st.coords[:, 2] + dy
            ok0 = st.valid & (nz >= 0) & (nz < d) & (ny >= 0) & (ny < h)
            if delta == 0:
                center = len(queries)
            queries.append(key_base + delta)
            masks.append(ok0)
    if center is not None:
        # the (δz=0, δy=0) pair queries the keys themselves — its row is
        # analytic (keys distinct + sorted): pos = iota, middle tap = self,
        # x±1 taps = adjacent sorted key differs by exactly 1. Saves 1/9 of
        # the rank-kernel work; pos=iota on padding rows is wrong-but-
        # monotone, which only widens a window (flags there are masked).
        v = st.keys.shape[0]
        iota = jnp.arange(v, dtype=jnp.int32)
        km = jnp.concatenate([jnp.full((1,), -9, jnp.int32), key_base[:-1]])
        kp = jnp.concatenate([key_base[1:], jnp.full((1,), -9, jnp.int32)])
        row_c = (
            iota * 8
            + (key_base - km == 1) * 4
            + st.valid.astype(jnp.int32) * 2
            + (kp - key_base == 1)
        )
        if _os.environ.get("EFG_SUBM_DERIVE", "0") == "1":
            # merge only the Δ<0 half; each Δ>0 pair is the TRANSPOSE of its
            # negation (key k has neighbour k+Δ at row r ⟺ key k+Δ has
            # neighbour (k+Δ)−Δ at the original row) — same scatter+cummax
            # scheme as `derive_strided_inverse`, halving the rank-kernel
            # work. Source rows must be mask-FINALIZED first (a set flag is
            # a valid in-grid correspondence; transposes need no re-mask).
            packed_neg = merge_rank_flags(st.keys, jnp.stack(queries[:center]))
            okm_n = jnp.stack(
                [masks[i] & (x - 1 >= 0) for i in range(center)]
            ).astype(jnp.int32)
            ok0_n = jnp.stack(masks[:center]).astype(jnp.int32)
            okp_n = jnp.stack(
                [masks[i] & (x + 1 < w) for i in range(center)]
            ).astype(jnp.int32)
            masked_neg = (
                (packed_neg & ~7)
                | (((packed_neg >> 2) & 1) & okm_n) * 4
                | (((packed_neg >> 1) & 1) & ok0_n) * 2
                | ((packed_neg & 1) & okp_n)
            )
            vcap = st.keys.shape[0]
            iota2 = jnp.arange(vcap, dtype=jnp.int32)
            adjm = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 (key_base[1:] - key_base[:-1] == 1).astype(jnp.int32)]
            )

            def scat_t(tgt, flag, val, bit):
                t = jnp.where(flag > 0, tgt, vcap)
                return (
                    jnp.zeros(vcap + 1, jnp.int32)
                    .at[t]
                    .max(val * 8 + bit, mode="drop")[:vcap]
                )

            derived = []
            for m in range(1, center + 1):  # mirror of pair (center − m)
                pk = masked_neg[center - m]
                pos = pk >> 3
                fm_ = (pk >> 2) & 1
                f0_ = (pk >> 1) & 1
                fp_ = pk & 1
                b1 = scat_t(pos + f0_, fp_, iota2 + 1, 4)
                b2 = scat_t(pos, f0_, iota2, 2)
                b3 = scat_t(pos - 1, fm_, iota2 - adjm, 1)
                pos8 = jax.lax.cummax(
                    jnp.maximum(jnp.maximum(b1, b2), b3)
                ) & ~7
                derived.append(pos8 | (b1 & 7) | (b2 & 7) | (b3 & 7))
            packed = jnp.concatenate(
                [packed_neg, row_c[None], jnp.stack(derived)], axis=0
            )
        else:
            others = queries[:center] + queries[center + 1 :]
            packed8 = merge_rank_flags(st.keys, jnp.stack(others))
            packed = jnp.concatenate(
                [packed8[:center], row_c[None], packed8[center:]], axis=0
            )
    else:
        packed = merge_rank_flags(st.keys, jnp.stack(queries))  # [P, V]
    ok0 = jnp.stack(masks)
    okm = (ok0 & (x - 1 >= 0)[None]).astype(jnp.int32)
    okp = (ok0 & (x + 1 < w)[None]).astype(jnp.int32)
    ok0 = ok0.astype(jnp.int32)
    packed = (
        (packed & ~7)
        | (((packed >> 2) & 1) & okm) * 4
        | (((packed >> 1) & 1) & ok0) * 2
        | ((packed & 1) & okp)
    )
    return jax.lax.optimization_barrier(packed)


def build_monotone_rule_strided(
    st_in, ob, oz, oy, ox, out_valid, kernel_size, stride, padding
):
    """Packed anchor rulebook [kd·kh, V_out] for a strided (generative) conv.

    Output sites are sorted by key, and for fixed (κz, κy) the queried input
    keys are monotone in the output row (the key map is monotone in the
    output's (b, oz, oy, ox) lexicographic order), so the same anchor
    format/kernel as SubM applies: for kw=3 the three κx taps hit input keys
    (q−1, q, q+1) around the middle-tap query q — the SubM (δx=−1,0,+1)
    pattern exactly. kw=1 (e.g. the (3,1,1) z-downsample) emits middle-only
    flags; the caller zero-pads the m/p weight blocks.

    Queries `in = o·s − p + κ` are linear in the output's sorted (b, oz,
    oy, ox) order, hence monotone per pair; invalid output rows map to the
    +inf tail; ranks come from the merge-join kernel and boundary masks are
    applied to the flags afterwards.
    """
    kd, kh, kw3 = kernel_size
    sd, sh, sw = stride
    pd, ph, pw = padding
    assert kw3 in (1, 3)
    d, h, w = st_in.spatial_shape

    queries, mm, m0, mp = [], [], [], []
    for kz in range(kd):
        for ky in range(kh):
            iz = oz * sd - pd + kz
            iy = oy * sh - ph + ky
            ok_zy = out_valid & (iz >= 0) & (iz < d) & (iy >= 0) & (iy < h)
            ix_mid = ox * sw - pw + (1 if kw3 == 3 else 0)
            if kw3 == 3:
                okm = ok_zy & (ix_mid - 1 >= 0) & (ix_mid - 1 < w)
                okp = ok_zy & (ix_mid + 1 >= 0) & (ix_mid + 1 < w)
            else:
                okm = okp = jnp.zeros_like(ok_zy)
            ok0 = ok_zy & (ix_mid >= 0) & (ix_mid < w)
            q0 = ((ob * d + iz) * h + iy) * w + ix_mid
            queries.append(jnp.where(out_valid, q0, _CLAMP_Q))
            mm.append(okm)
            m0.append(ok0)
            mp.append(okp)
    packed = merge_rank_flags(st_in.keys, jnp.stack(queries))
    okm = jnp.stack(mm).astype(jnp.int32)
    ok0 = jnp.stack(m0).astype(jnp.int32)
    okp = jnp.stack(mp).astype(jnp.int32)
    rows = list(
        (packed & ~7)
        | (((packed >> 2) & 1) & okm) * 4
        | (((packed >> 1) & 1) & ok0) * 2
        | ((packed & 1) & okp)
    )
    if kh == 1:
        # pairs are per-κz and query DIFFERENT z-planes; the kernel windows
        # one group of 3 pairs together, so give each κz its own group
        # padded with zero-flag dummies that share its positions (window
        # stays tight, taps contribute nothing). Caller zero-pads weights
        # to match (see `spconv_downsample`). Applies to kd == 1 too so a
        # (1, 1, 1) kernel still meets the 3-per-group granularity.
        expanded = []
        for r in rows:
            dummy = (r >> 3) * 8
            expanded += [r, dummy, dummy]
        rows = expanded
    return jax.lax.optimization_barrier(jnp.stack(rows))  # [P, V_out]


def strided_conv_packed(
    features: jax.Array,  # [V_in, C]
    packed,  # PreppedRule or raw [P, V_out] from the strided builder
    weights: jax.Array,  # [K, C, O], (κz, κy, κx) raster
    out_valid: jax.Array,  # [V_out]
    *,
    kw3: int,  # x extent of the kernel (1 or 3)
    band: int = BAND,
    wslack: int = WSLACK,
    inv: tuple | None = None,  # (PreppedRule-or-raw, wmap) inverse rulebook
) -> jax.Array:
    """Fused strided-conv forward + dW. d_features runs on the fused kernel
    too when `inv` (the parity pseudo-pair inverse rulebook from
    `build_monotone_rule_strided_inverse`) is provided; otherwise it falls
    back to the XLA inverse-gather path.

    Channels pad to 16 (like `subm_conv9`); kw=1 kernels zero-pad the
    m/p tap weight blocks."""
    k, cin0, cout = weights.shape
    n_pairs = k // kw3
    cin = _rup(cin0, 16)
    if cin != cin0:
        features = jnp.pad(features, ((0, 0), (0, cin - cin0)))
        weights = jnp.pad(weights, ((0, 0), (0, cin - cin0), (0, 0)))
    if kw3 == 1:
        wtap = jnp.zeros((n_pairs, 3, cin, cout), weights.dtype)
        wtap = wtap.at[:, 1].set(weights.reshape(n_pairs, cin, cout))
    else:
        wtap = weights.reshape(n_pairs, 3, cin, cout)
    w2d = wtap.reshape(n_pairs * 3 * cin, cout)
    v_in = features.shape[0]
    if not isinstance(packed, PreppedRule):
        packed = prep_rulebook(packed, v_in, cin, band=band, wslack=wslack)
    if inv is not None and not isinstance(inv[0], PreppedRule):
        inv = (prep_rulebook(inv[0], packed.v_out, cout), inv[1])

    @jax.custom_vjp
    def f(feats, w2d):
        out = fused_gather_gemm(feats, packed, w2d, band=band, wslack=wslack)
        return out * out_valid[:, None].astype(jnp.float32)

    def fwd(feats, w2d):
        # residual-carried structure arrays: see subm_conv9's note on
        # closure-capture rematerialization; feat3 shared fwd ↔ dW
        packed_inv = inv[0] if inv is not None else None
        f3 = feat3_of(packed, feats)
        out = fused_gather_gemm(
            feats, packed, w2d, f3, band=band, wslack=wslack
        ) * out_valid[:, None].astype(jnp.float32)
        return out, (feats, w2d, packed, packed_inv, out_valid, f3)

    def _d_feats_fused(w2d, g, packed_inv, feats=None):
        """d_features as ANOTHER fused gather over the inverse rulebook:
        gather source = output-row grads, weights = transposed κ blocks
        routed by the pseudo-pair tap map.

        When `feats` is given, the gather also emits its stacked tap buffer
        stacked_g[(pp,t)·O+o, u] = found·ĝ[out_κ(u), o] (κ = wmap[pp][t]) and
        dW comes back as ONE dense GEMM + static wmap block routing:
        dW[κ][c,o] = Σ_u f[u,c]·ĝ[out_κ(u),o] — the inverse rulebook already
        encodes the v = out_κ(u) correspondence, so no raster flip. Returns
        (d_feats, dw[K·cin, O]) then; replaces the dW re-gather kernel."""
        _, wmap = inv
        # w2d rows are ((κz·kh+κy), κx-tap, c); flat κ = pair·kw3 + κx
        wk = w2d.reshape(n_pairs, 3, cin, cout)
        if kw3 == 1:
            wk = wk[:, 1:2]  # single real tap
        wk = wk.reshape(n_pairs * kw3, cin, cout)
        zero = jnp.zeros((cout, cin), w2d.dtype)
        blocks = [
            jnp.swapaxes(wk[ki], 0, 1) if ki >= 0 else zero
            for pair_taps in wmap
            for ki in pair_taps
        ]
        w_inv = jnp.stack(blocks).reshape(len(wmap) * 3 * cout, cin)
        # inverse spread per 128 input rows is ~128·(V_out/V_in) < 128 —
        # the default (SubM-sized) band suffices regardless of the
        # forward's widened band
        if feats is None:
            d = fused_gather_gemm(g, packed_inv, w_inv)
            return d[:v_in]
        d, stacked_g = fused_gather_gemm(g, packed_inv, w_inv,
                                         emit_stacked=True)
        vt = stacked_g.shape[1]
        fpad = jnp.pad(
            feats, ((0, vt - feats.shape[0]), (0, 0))
        ).astype(jnp.bfloat16)
        g2 = jax.lax.dot_general(
            stacked_g, fpad, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(len(wmap), 3, cout, cin)
        dwk = jnp.zeros((n_pairs * kw3, cin, cout), jnp.float32)
        for pp, pair_taps in enumerate(wmap):
            for t, ki in enumerate(pair_taps):
                if ki >= 0:
                    dwk = dwk.at[ki].add(jnp.swapaxes(g2[pp, t], 0, 1))
        if kw3 == 1:
            dw_full = dwk.reshape(n_pairs, 1, cin, cout)
            dw_full = jnp.pad(dw_full, ((0, 0), (1, 1), (0, 0), (0, 0)))
        else:
            dw_full = dwk.reshape(n_pairs, 3, cin, cout)
        return d[:v_in], dw_full.reshape(n_pairs * 3 * cin, cout)

    def _d_feats_xla(w2d, g, rule):
        # invert the packed map (injective per (pair, tap)) and run the XLA
        # gather-GEMM with transposed weights
        from efg_tpu.ops import sparse as S

        packed = rule.raw
        pos = packed >> 3
        v_out = packed.shape[1]
        rng = jnp.arange(v_out, dtype=jnp.int32)

        inv_rows = []
        for p in range(n_pairs):
            fm = (packed[p] >> 2) & 1
            f0 = (packed[p] >> 1) & 1
            fp = packed[p] & 1
            taps = (
                (pos[p] - 1, fm),
                (pos[p], f0),
                (pos[p] + f0, fp),
            )
            for r, flag in taps:
                tgt = jnp.where(flag > 0, r, v_in)
                inv_rows.append(
                    jnp.full(v_in + 1, -1, jnp.int32)
                    .at[tgt]
                    .set(rng, mode="drop")[:v_in]
                )
        inv_rb = jnp.stack(inv_rows)  # [n_pairs·3, V_in]
        wt = jnp.swapaxes(w2d.reshape(n_pairs * 3, cin, cout), 1, 2)
        return S._gather_gemm_impl(
            g.astype(jnp.float32), inv_rb, wt, jnp.ones(v_in, bool)
        )

    def bwd(res, g):
        feats, w2d, packed_r, packed_inv, ov, f3 = res
        g = g * ov[:, None].astype(g.dtype)
        if inv is not None and cout % 16 == 0:
            d_feats, dw_full = _d_feats_fused(
                w2d, g.astype(jnp.float32), packed_inv, feats
            )
            return d_feats.astype(feats.dtype), dw_full.astype(w2d.dtype)
        if inv is not None:
            d_feats = _d_feats_fused(w2d, g.astype(jnp.float32), packed_inv)
        else:
            d_feats = _d_feats_xla(w2d, g.astype(jnp.float32), packed_r)
        d_feats = d_feats.astype(feats.dtype)

        dw_full = fused_gather_dw(
            feats, packed_r, g.astype(jnp.float32), f3, band=band, wslack=wslack
        )  # [n_pairs·3·cin, O]
        return d_feats, dw_full.astype(w2d.dtype)

    f.defvjp(fwd, bwd)
    out = f(features, w2d)
    return out


def build_monotone_rule_strided_inverse(
    st_in, out_keys, out_spatial, ks, stride, padding
):
    """Inverse packed rulebook for the strided conv's d_features: for each
    INPUT row, which OUTPUT rows consume it, and through which kernel
    offset. Returns (packed_inv [P₂, V_in], wmap [P₂][3]) where wmap gives
    the flat κ index feeding each tap slot (−1 = zero weight).

    Under x-stride 2 an input row feeds ≤2 outputs whose κx depends on the
    x parity, which a fixed tap→weight block cannot express — so each
    (κz, κy) splits into parity PSEUDO-PAIRS with fixed maps:
      · sw=2, kw=3:  A (x+pw even): taps (·, κx=2, κx=0) at output keys
        (q, q+1);  B (x+pw odd): tap (·, κx=1, ·) — 2 pairs each.
      · sw=1, kw=3:  one pair, taps (κx=2, κx=1, κx=0) at (q−1, q, q+1).
      · kw=1: one pair, middle tap only.
    Queried output keys are monotone over the (sorted) input rows per
    pseudo-pair; invalid rows are backfilled with a running max. Pairs are
    zero-padded to a multiple of 3 (the kernel's group granularity).
    """
    kd, kh, kw3 = ks
    sd, sh, sw = stride
    pd, ph, pw = padding
    assert kw3 in (1, 3) and sw in (1, 2)
    od, oh, ow = out_spatial
    v_out = out_keys.shape[0]
    cells = st_in.batch_size * od * oh * ow
    assert cells < 2**31

    b = st_in.coords[:, 0]
    z = st_in.coords[:, 1]
    y = st_in.coords[:, 2]
    x = st_in.coords[:, 3]

    # first pass collects queries + flag masks per (κz, κy); one merge-join
    # kernel call ranks them all against the sorted out_keys; `fixups` then
    # split each ranked row into its pseudo-pairs. The raw query is only
    # monotone over the rows whose (z, y) parities match the pair (floor
    # divisions reuse the same output line for sh consecutive y's), so
    # non-participating rows are backfilled with a running max — the kernel
    # requires globally monotone query rows.
    _q, _mm, _m0, _mp = [], [], [], []

    def lookup3(q, okm, ok0, okp):
        ok_any = okm | ok0 | okp
        qv = jnp.maximum(
            jax.lax.cummax(jnp.where(ok_any, q, jnp.iinfo(jnp.int32).min)), 0
        )
        _q.append(jnp.where(st_in.valid, qv, _CLAMP_Q))
        _mm.append(okm)
        _m0.append(ok0)
        _mp.append(okp)
        return len(_q) - 1  # placeholder index resolved after the kernel

    fixups = []  # (query index, fn(packed_row) → [final rows])
    wmap = []
    for kz in range(kd):
        for ky in range(kh):
            ozn = z + pd - kz
            oyn = y + ph - ky
            oz = ozn // sd
            oy = oyn // sh
            okzy = (
                st_in.valid
                & (ozn % sd == 0) & (oz >= 0) & (oz < od)
                & (oyn % sh == 0) & (oy >= 0) & (oy < oh)
            )
            kflat = (kz * kh + ky) * kw3
            base = ((b * od + oz) * oh + oy) * ow

            if kw3 == 3 and sw == 2:
                # the A (κx∈{2,0}, x+pw even) and B (κx=1, odd) parity
                # pairs partition the rows, and their merged query is still
                # monotone — ONE ranked row serves both (halves the
                # builder's kernel work), flags split by parity afterwards
                par_even = (x + pw) % 2 == 0
                oxa = (x + pw) // 2 - 1  # A: κx=2 output; κx=0 at oxa+1
                oxb = (x + pw - 1) // 2  # B: κx=1 output
                oxm = jnp.where(par_even, oxa, oxb)
                okA = okzy & par_even
                okB = okzy & ~par_even
                qi = lookup3(
                    base + oxm,
                    jnp.zeros_like(okzy),
                    okzy & (oxm >= 0) & (oxm < ow),
                    okA & (oxm + 1 >= 0) & (oxm + 1 < ow),
                )

                def split_ab(pk_m, okA=okA, okB=okB):
                    pos_f = (pk_m >> 3) * 8
                    f0 = (pk_m >> 1) & 1
                    fp = pk_m & 1
                    return [
                        pos_f + (f0 & okA.astype(jnp.int32)) * 2 + fp,
                        pos_f + (f0 & okB.astype(jnp.int32)) * 2,
                    ]

                fixups.append((qi, split_ab))
                wmap.append((-1, kflat + 2, kflat + 0))
                wmap.append((-1, kflat + 1, -1))
            elif kw3 == 3 and sw == 1:
                oxm = x + pw - 1  # κx=1 output; κx=2 at oxm−1, κx=0 at oxm+1
                qi = lookup3(
                    base + oxm,
                    okzy & (oxm - 1 >= 0) & (oxm - 1 < ow),
                    okzy & (oxm >= 0) & (oxm < ow),
                    okzy & (oxm + 1 >= 0) & (oxm + 1 < ow),
                )
                fixups.append((qi, lambda pk: [pk]))
                wmap.append((kflat + 2, kflat + 1, kflat + 0))
            else:  # kw3 == 1
                oxn = x + pw
                ox = oxn // sw
                ok = okzy & (oxn % sw == 0) & (ox >= 0) & (ox < ow)
                qi = lookup3(
                    base + ox, jnp.zeros_like(ok), ok, jnp.zeros_like(ok)
                )
                fixups.append((qi, lambda pk: [pk]))
                wmap.append((-1, kflat, -1))

    ranked = merge_rank_flags(out_keys, jnp.stack(_q))  # [nq, V_in]
    okm = jnp.stack(_mm).astype(jnp.int32)
    ok0 = jnp.stack(_m0).astype(jnp.int32)
    okp = jnp.stack(_mp).astype(jnp.int32)
    ranked = (
        (ranked & ~7)
        | (((ranked >> 2) & 1) & okm) * 4
        | (((ranked >> 1) & 1) & ok0) * 2
        | ((ranked & 1) & okp)
    )
    rows = []
    for qi, fn in fixups:
        rows.extend(fn(ranked[qi]))

    if kh == 1 and kd > 1:
        # per-κz pairs target different output z-planes — isolate each in
        # its own group with position-sharing zero-flag dummies (same
        # reasoning as the forward builder). The caller's weights are
        # expanded the same way (real κz at slot 3·κz), so remap indices.
        rows = [r2 for r in rows for r2 in (r, (r >> 3) * 8, (r >> 3) * 8)]
        wmap = [
            m2
            for m in wmap
            for m2 in (
                tuple(3 * ki if ki >= 0 else -1 for ki in m),
                (-1, -1, -1),
                (-1, -1, -1),
            )
        ]
    while len(rows) % 3:  # pad to the kernel's 3-pair group granularity
        rows.append(jnp.full_like(rows[0], v_out * 8))
        wmap.append((-1, -1, -1))
    return jax.lax.optimization_barrier(jnp.stack(rows)), tuple(wmap)


def derive_strided_inverse(packed_fwd, out_keys, v_in, ks, stride, padding):
    """Inverse packed rulebook DERIVED from the forward one — no second
    merge-join kernel call (the r4 device trace charged ~20 ms/step to the
    strided-INVERSE merges alone at Waymo bs=4 scale).

    Same contract as `build_monotone_rule_strided_inverse` (packed_inv
    [P₂, V_in], wmap), built from the transpose duality: every SET forward
    tap flag is a (output row o ↔ input row r) correspondence whose inverse
    anchor rank is known in closed form —
      · fwd f0 hit (κx=1 / mid) at r=pos:      rank of q_inv(r)=a_o    = o
      · fwd fp hit (κx=2)      at r=pos+f0:    sw=2 A-mid rank(a_o)    = o
                                               sw=1 m-tap rank(a_o+1)  = o+1
      · fwd fm hit (κx=0)      at r=pos−1:     p-tap rank(a_o−1) = o−adj[o]
    with adj[o] = (out_keys[o]−out_keys[o−1] == 1) (keys sorted distinct).
    Scatter those exact ranks+flags to their input rows (≤3 width-1
    scatters of V_out rows per (κz, κy) — forward flags are injective per
    tap so bits never collide at a row within one buffer) and backfill the
    un-hit rows with one running max per (κz, κy) — the SAME cummax count
    as the deleted `lookup3` query builder, so the merge kernel and the
    per-pair query/coordinate math are pure savings. Grid-boundary masking
    is inherited from the forward flags (a set flag IS a valid in-grid
    correspondence), so no coordinate logic is needed at all."""
    kd, kh, kw3 = ks
    sw = stride[2]
    assert kw3 in (1, 3) and sw in (1, 2)
    v_out = out_keys.shape[0]

    rows_fwd = packed_fwd[::3] if kh == 1 else packed_fwd  # undo ×3 dummies
    o = jnp.arange(v_out, dtype=jnp.int32)
    adj = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (out_keys[1:] - out_keys[:-1] == 1).astype(jnp.int32)]
    )

    def scat(targets, flags, vals_pos, bit):
        tgt = jnp.where(flags > 0, targets, v_in)
        return (
            jnp.zeros(v_in + 1, jnp.int32)
            .at[tgt]
            .max(vals_pos * 8 + bit, mode="drop")[:v_in]
        )

    rows, wmap = [], []
    for kz in range(kd):
        for ky in range(kh):
            p = kz * kh + ky
            pk = rows_fwd[p]
            pos = pk >> 3
            fm = (pk >> 2) & 1
            f0 = (pk >> 1) & 1
            fp = pk & 1
            kflat = p * kw3
            if kw3 == 3 and sw == 2:
                bA1 = scat(pos + f0, fp, o, 2)  # κx=2 → A mid
                bA2 = scat(pos - 1, fm, o - adj, 1)  # κx=0 → A p-tap
                bB = scat(pos, f0, o, 2)  # κx=1 → B mid
                pos8 = jax.lax.cummax(jnp.maximum(jnp.maximum(bA1, bA2), bB)) & ~7
                rows.append(pos8 | (bA1 & 7) | (bA2 & 7))
                rows.append(pos8 | (bB & 7))
                wmap.append((-1, kflat + 2, kflat + 0))
                wmap.append((-1, kflat + 1, -1))
            elif kw3 == 3 and sw == 1:
                b1 = scat(pos + f0, fp, o + 1, 4)  # κx=2 → m-tap
                b2 = scat(pos, f0, o, 2)  # κx=1 → mid
                b3 = scat(pos - 1, fm, o - adj, 1)  # κx=0 → p-tap
                pos8 = jax.lax.cummax(jnp.maximum(jnp.maximum(b1, b2), b3)) & ~7
                rows.append(pos8 | (b1 & 7) | (b2 & 7) | (b3 & 7))
                wmap.append((kflat + 2, kflat + 1, kflat + 0))
            else:  # kw3 == 1
                b = scat(pos, f0, o, 2)
                pos8 = jax.lax.cummax(b) & ~7
                rows.append(pos8 | (b & 7))
                wmap.append((-1, kflat, -1))

    if kh == 1 and kd > 1:
        rows = [r2 for r in rows for r2 in (r, (r >> 3) * 8, (r >> 3) * 8)]
        wmap = [
            m2
            for m in wmap
            for m2 in (
                tuple(3 * ki if ki >= 0 else -1 for ki in m),
                (-1, -1, -1),
                (-1, -1, -1),
            )
        ]
    while len(rows) % 3:
        rows.append(jnp.full_like(rows[0], v_out * 8))
        wmap.append((-1, -1, -1))
    return jax.lax.optimization_barrier(jnp.stack(rows)), tuple(wmap)
