"""Box attention sampling: rotated-box bilinear sampling + weighted sum.

TPU-native replacement for the reference CUDA kernel
(`efg/operators/src/box_attn/box_attn_kernel.cuh`, python wrapper
`efg/operators/box_attention_func.py:10-64`): each (query, head, level)
samples a k×k grid of points inside a rotated box and combines them with
softmax weights. Implemented as XLA gathers accumulated point-by-point so
the [B, L, heads, points, dim] tensor is never materialized; autodiff gives
the backward pass. (A fused Pallas kernel is the planned fast path.)

All feature maps are NHWC; grid coords are normalized [0, 1] per level.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(value: jax.Array, gx: jax.Array, gy: jax.Array, h: int, w: int):
    """value [B, H*W, HD] (flattened per level, head-major channels),
    gx/gy [B, L, NH] in pixel coords → [B, L, NH, head_dim] where value's
    channel dim is NH*head_dim and each head reads its own slice.

    Out-of-range taps contribute zero (matches the CUDA kernel's border
    handling of sampling outside the feature map).
    """
    b, hw, c = value.shape
    nh = gx.shape[-1]
    hd = c // nh
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    out = None
    vv = value.reshape(b, hw, nh, hd)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (1 - jnp.abs(gx - xi)) * (1 - jnp.abs(gy - yi))
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        # gather per head: idx [B, L, NH] into [B, HW, NH, hd]
        g = jnp.take_along_axis(vv, idx[..., None], axis=1)  # [B, L, NH, hd]
        contrib = g * (wgt * ok)[..., None].astype(value.dtype)
        out = contrib if out is None else out + contrib
    return out


def box_attention_sample(
    value_levels: Sequence[jax.Array],
    grids: jax.Array,
    attn_weights: jax.Array,
    *,
    num_heads: int,
) -> jax.Array:
    """Sample and combine.

    value_levels: list of [B, H_l, W_l, C] maps (C = num_heads * head_dim)
    grids:        [B, L, num_heads, num_levels, P, 2] normalized (x, y)
    attn_weights: [B, L, num_heads, num_levels, P] (softmaxed)
    → [B, L, C]
    """
    b, l, nh, nlvl, p, _ = grids.shape
    c = value_levels[0].shape[-1]
    hd = c // num_heads
    out = jnp.zeros((b, l, nh, hd), dtype=value_levels[0].dtype)
    for lvl, vmap_ in enumerate(value_levels):
        h, w = vmap_.shape[1:3]
        flat = vmap_.reshape(b, h * w, c)
        for pi in range(p):
            gx = grids[:, :, :, lvl, pi, 0] * w - 0.5
            gy = grids[:, :, :, lvl, pi, 1] * h - 0.5
            sampled = _bilinear_gather(flat, gx, gy, h, w)  # [B, L, NH, hd]
            out = out + sampled * attn_weights[:, :, :, lvl, pi, None].astype(out.dtype)
    return out.reshape(b, l, c)


def _window_offsets(radius: int):
    s = 2 * radius + 1
    return [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)], s


def bin_window_coeffs(
    grids: jax.Array,        # [B, L, NH, 1, P, 2] normalized (x, y)
    attn_weights: jax.Array,  # [B, L, NH, 1, P]
    base_yx: jax.Array,       # [B, L, 2] int32 anchor cell (y, x)
    h: int,
    w: int,
    radius: int,
) -> jax.Array:
    """Bin every bilinear tap of every sample point into an integer-offset
    window around the query's anchor cell.

    Each of the P points contributes 4 bilinear taps at integer positions;
    a tap at offset (dy, dx) from the anchor (clamped into ±radius) adds
    its bilinear×attention weight to bin (dy+R)·(2R+1)+(dx+R). Taps outside
    the feature map contribute zero (the CUDA kernel's border handling,
    `box_attn_kernel.cuh`). Offsets beyond the radius are clamped to the
    window edge — a documented deviation bounding the attention span to
    ±radius cells (encoder ref windows are ~5 px, so radius 4–8 covers the
    5×5 sampling grid with slack).

    Returns A [B, L, NH, (2R+1)²] f32.
    """
    b, l, nh, nlvl, p, _ = grids.shape
    assert nlvl == 1, "window path supports a single value level"
    s = 2 * radius + 1
    gx = grids[..., 0, :, 0] * w - 0.5  # [B, L, NH, P]
    gy = grids[..., 0, :, 1] * h - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    bx = base_yx[..., 1][:, :, None, None]
    by = base_yx[..., 0][:, :, None, None]
    aw = attn_weights[..., 0, :]

    acc = jnp.zeros((b, l, nh, s * s), jnp.float32)
    oidx = jnp.arange(s * s, dtype=jnp.int32)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wt = jnp.where(dx == 1, fx, 1 - fx) * jnp.where(dy == 1, fy, 1 - fy)
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        rx = jnp.clip(xi.astype(jnp.int32) - bx, -radius, radius)
        ry = jnp.clip(yi.astype(jnp.int32) - by, -radius, radius)
        o = (ry + radius) * s + (rx + radius)  # [B, L, NH, P]
        contrib = (wt * aw * ok).astype(jnp.float32)
        # compare-iota reduction: never materializes [..., P, S]
        acc = acc + jnp.sum(
            contrib[..., None] * (o[..., None] == oidx), axis=-2
        )
    return acc


def _interleave(v: jax.Array, num_heads: int) -> jax.Array:
    """[..., C] head-major (c = h·hd + d) → interleaved (c = d·NH + h)."""
    c = v.shape[-1]
    hd = c // num_heads
    return v.reshape(v.shape[:-1] + (num_heads, hd)).swapaxes(-1, -2).reshape(
        v.shape[:-1] + (c,)
    )


def _deinterleave(v: jax.Array, num_heads: int) -> jax.Array:
    c = v.shape[-1]
    hd = c // num_heads
    return v.reshape(v.shape[:-1] + (hd, num_heads)).swapaxes(-1, -2).reshape(
        v.shape[:-1] + (c,)
    )


def box_attention_window_dense(
    value: jax.Array,   # [B, H, W, C]
    coeffs: jax.Array,  # [B, H·W, NH, S²] from bin_window_coeffs
    *,
    num_heads: int,
    radius: int,
) -> jax.Array:
    """Window attention where every query is anchored at its own cell
    (encoder self-attention): out = Σ_o A[...,o] · shift_o(value).

    Pure shifted slices — no gathers, no scatters; autodiff gives
    pad-and-add for the backward. All arithmetic stays on [B, H, W, C]
    (lane dim C, zero tile padding); the per-head coefficient is broadcast
    over an interleaved channel layout (c = d·NH + h) so the broadcast is
    a fused index remap, not a relayout.
    """
    b, h, w, c = value.shape
    hd = c // num_heads
    offsets, s = _window_offsets(radius)
    vi = _interleave(value, num_heads)
    vp = jnp.pad(vi, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    a = coeffs.reshape(b, h, w, num_heads, s * s).astype(value.dtype)
    out = jnp.zeros((b, h, w, c), value.dtype)
    for o, (dy, dx) in enumerate(offsets):
        a_o = a[..., o]  # [B, H, W, NH]
        a_exp = jnp.broadcast_to(
            a_o[:, :, :, None, :], (b, h, w, hd, num_heads)
        ).reshape(b, h, w, c)
        out = out + a_exp * vp[:, dy + radius : dy + radius + h,
                               dx + radius : dx + radius + w]
    return _deinterleave(out, num_heads).reshape(b, h * w, c)


def _overlap_tiles(x: jax.Array, axis: int, n_tiles: int, stride: int, extent: int):
    """Split `axis` (length ≥ (n_tiles-1)·stride + extent, caller-padded to
    (n_tiles + n_slices - 1)·stride) into `n_tiles` OVERLAPPING windows of
    `extent` rows at `stride` spacing, via shifted reshapes only (no gather
    — autodiff gives cheap pad-adds, not scatters). Returns the tile axis
    inserted at `axis` with the window axis right after."""
    n_slices = -(-extent // stride)
    parts = []
    for k in range(n_slices):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k * stride, (k + n_tiles) * stride)
        seg = x[tuple(sl)]
        new_shape = seg.shape[:axis] + (n_tiles, stride) + seg.shape[axis + 1:]
        parts.append(seg.reshape(new_shape))
    out = jnp.concatenate(parts, axis=axis + 1)
    sl = [slice(None)] * out.ndim
    sl[axis + 1] = slice(0, extent)
    return out[tuple(sl)]


def box_attention_window_dense_mxu(
    value: jax.Array,   # [B, H, W, C]
    coeffs: jax.Array,  # [B, H·W, NH, S²] from bin_window_coeffs
    *,
    num_heads: int,
    radius: int,
    ty: int = 8,
    tx: int = 16,
) -> jax.Array:
    """Window self-attention as tile-local DENSE attention on the MXU.

    Queries are tiled (ty×tx); each tile attends a (ty+2R)×(tx+2R) key
    patch. The per-query S² binned coefficients scatter into a tile-local
    [Q, K] attention matrix via ONE batched one-hot matmul (k(q,o) =
    base(q)+off(o) is always in range), then out = A_t @ K_patch is a
    second batched matmul. Replaces the S² shifted elementwise passes
    (VPU/HBM bound) with two MXU contractions; key patches are built with
    shifted reshapes so autodiff emits pad-adds, not scatters."""
    b, h, w, c = value.shape
    hd = c // num_heads
    s = 2 * radius + 1
    l = coeffs.shape[1]
    assert l == h * w
    ey, ex = ty + 2 * radius, tx + 2 * radius
    nty, ntx = -(-h // ty), -(-w // tx)
    nsy, nsx = -(-ey // ty), -(-ex // tx)
    # pad the value map: R halo in front, tail up to the shifted-reshape
    # requirement ((n_tiles + n_slices - 1)·stride)
    py = (nty + nsy - 1) * ty - (h + radius)
    px = (ntx + nsx - 1) * tx - (w + radius)
    vp = jnp.pad(
        value.astype(jnp.bfloat16),
        ((0, 0), (radius, py), (radius, px), (0, 0)),
    )
    k_rows = _overlap_tiles(vp, 1, nty, ty, ey)       # [B, nty, ey, Wp, C]
    k_pat = _overlap_tiles(k_rows, 3, ntx, tx, ex)    # [B, nty, ey, ntx, ex, C]
    k_pat = k_pat.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, nty * ntx, ey * ex, num_heads, hd
    )

    # coefficients → [B, T, Q, NH, S²] tile layout (zero-pad H/W remainders)
    a = coeffs.reshape(b, h, w, num_heads, s * s).astype(jnp.bfloat16)
    a = jnp.pad(a, ((0, 0), (0, nty * ty - h), (0, ntx * tx - w), (0, 0), (0, 0)))
    a = a.reshape(b, nty, ty, ntx, tx, num_heads, s * s)
    a = a.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
        b, nty * ntx, ty * tx, num_heads, s * s
    )

    # one-hot scatter matrix P[q, o, k]: k = (u+R+dy)·ex + (v+R+dx)
    u = jnp.arange(ty)[:, None] + radius  # [ty, 1]
    v = jnp.arange(tx)[None, :] + radius  # [1, tx]
    dy = jnp.arange(-radius, radius + 1)[:, None]
    dx = jnp.arange(-radius, radius + 1)[None, :]
    base = (u * ex + v).reshape(ty * tx)              # [Q]
    off = (dy * ex + dx).reshape(s * s)               # [S²]
    kq = base[:, None] + off[None, :]                 # [Q, S²]
    p_mat = (kq[:, :, None] == jnp.arange(ey * ex)).astype(jnp.bfloat16)

    # remat: a_t ([B,T,NH,Q,ey·ex] bf16, ~4.7× the coeffs tensor) is cheap
    # to rebuild from the one-hot matmul — don't hold it live for the bwd
    @jax.checkpoint
    def attend(a_, k_):
        a_t = jnp.einsum("btqno,qok->btnqk", a_, p_mat,
                         preferred_element_type=jnp.bfloat16)
        return jnp.einsum("btnqk,btknd->btqnd", a_t, k_,
                          preferred_element_type=jnp.float32)

    out = attend(a, k_pat)
    out = out.reshape(b, nty, ntx, ty, tx, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, nty * ty, ntx * tx, c)[:, :h, :w]
    return out.reshape(b, h * w, c).astype(value.dtype)


def _dot_dtype():
    """bf16 MXU dots on TPU; f32 on CPU (XLA:CPU's DotThunk cannot execute
    BF16×BF16→F32, and the tests run on the forced-CPU surface)."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _chunked(coeffs: jax.Array, base_yx: jax.Array, chunk: int, s: int):
    b, l = coeffs.shape[:2]
    pad_l = (-l) % chunk
    coeffs_p = jnp.pad(coeffs, ((0, 0), (0, pad_l), (0, 0), (0, 0)))
    base_p = jnp.pad(base_yx, ((0, 0), (0, pad_l), (0, 0)))
    n_chunks = (l + pad_l) // chunk
    a_ch = coeffs_p.reshape(b, n_chunks, chunk, coeffs.shape[2], s * s).swapaxes(0, 1)
    b_ch = base_p.reshape(b, n_chunks, chunk, 2).swapaxes(0, 1)
    return a_ch, b_ch, n_chunks


def _gather_patches_runs(vflat: jax.Array, base_c: jax.Array, h: int, s: int,
                         num_heads: int):
    """Window patches for one query chunk from the x-padded interleaved map.

    The whole S×S window is ONE 2D gather slice of the [H, Wp·C]-viewed
    map: rows y0..y0+S−1, cols x·C..(x+S)·C (window rows are contiguous in
    the x-padded layout). One slice descriptor per query instead of S row
    slices — the per-row version spent ~1 µs/descriptor (≈8 GB/s effective,
    6×46.6 ms/step in the r4 ConQueR trace) on descriptor issue, not DMA.

    The map is y-padded by R rows as well as x-padded, so the slice never
    clamps: patch row (dy+R) always reads true row y+dy, with out-of-map
    rows fetching zeros (their bins carry zero weight via the
    bin_window_coeffs mask). → [B, chunk, S², hd, NH].
    """
    b, hp, wp, c = vflat.shape
    assert hp == h + (s - 1), "vflat must be y-padded by radius on each side"
    ch = base_c.shape[1]
    v2d = vflat.reshape(b, hp, wp * c)
    y0 = base_c[..., 0]  # padded row y is the window's top row (y−R+R)
    xc = base_c[..., 1] * c
    starts = jnp.stack([y0, xc], -1)  # [B, chunk, 2]
    gdn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1),
    )
    patch = jax.vmap(
        lambda v, st: jax.lax.gather(v, st, gdn, slice_sizes=(s, s * c),
                                     mode="clip")
    )(v2d, starts)  # [B, chunk, S, S·C]
    return patch.reshape(b, ch, s * s, c // num_heads, num_heads)


def _window_gather_runs_impl(value, coeffs, base_yx, num_heads, radius, chunk):
    b, h, w, c = value.shape
    s = 2 * radius + 1
    l = coeffs.shape[1]
    vi = _interleave(value, num_heads)
    # pad y AND x so each window is one in-bounds contiguous 2D slice
    vflat = jnp.pad(
        vi.astype(jnp.bfloat16),
        ((0, 0), (radius, radius), (radius, radius), (0, 0)),
    )

    # head-selection one-hot E[c, n] = 1 iff channel c belongs to head n
    # (interleaved layout: n = c mod NH)
    e_sel = (
        jnp.arange(c, dtype=jnp.int32)[:, None] % num_heads
        == jnp.arange(num_heads, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)

    def body(args):
        a_c, base_c = args  # [B, chunk, NH, S²], [B, chunk, 2]
        patch = _gather_patches_runs(vflat, base_c, h, s, num_heads)
        patch = patch.reshape(b, a_c.shape[1], s * s, c)
        # Contract S² as a REAL MXU matmul with redundant heads:
        #   T[b,q,n,c] = Σ_o a[b,q,n,o] · patch[b,q,o,c]   (K = S²)
        #   out[b,q,c] = T[b,q,n(c),c]                      (one-hot reduce)
        # 8× redundant FLOPs but trivially cheap on the MXU, and BOTH
        # operands contract in their natural layouts (lhs O minor, rhs C
        # free minor) so no relayout copies. Alternatives measured worse
        # on TPU (r4 traces): dot_general batched over NH (a minor dim)
        # forced f32 relayout copies of the patches (≈38 ms/layer);
        # broadcast-multiply-reduce materialized the [B,chunk,S²,hd,NH]
        # f32 product (≈80 ms/layer of broadcast + reshape + reduce).
        dd = _dot_dtype()
        t = jax.lax.dot_general(
            a_c.astype(dd), patch.astype(dd),
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [B, chunk, NH, C]
        return (t * e_sel.T[None, None]).sum(2)  # [B, chunk, C]

    a_ch, b_ch, n_chunks = _chunked(coeffs, base_yx, chunk, s)
    out = jax.lax.map(body, (a_ch, b_ch))  # [n_chunks, B, chunk, C]
    out = out.swapaxes(0, 1).reshape(b, n_chunks * chunk, c)[:, :l]
    return _deinterleave(out.astype(value.dtype), num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _window_gather_runs(value, coeffs, base_yx, num_heads, radius, chunk):
    return _window_gather_runs_impl(value, coeffs, base_yx, num_heads, radius, chunk)


def _window_gather_runs_fwd(value, coeffs, base_yx, num_heads, radius, chunk):
    out = _window_gather_runs_impl(value, coeffs, base_yx, num_heads, radius, chunk)
    # residuals are the ORIGINAL inputs: patches are re-gathered in bwd
    # (cheaper than saving the [L, S², C] patch tensor across chunks)
    return out, (value, coeffs, base_yx)


def _window_gather_runs_bwd(num_heads, radius, chunk, res, g):
    """Custom backward. dA re-gathers the window patches and contracts the
    head dim; dV scatter-adds each query's window contribution ROW by ROW
    (S scan steps of windowed [B, L, S·C] scatter-adds — see dv_body) —
    the plain autodiff transpose of the patch gather would scatter B·L
    whole S×S·C windows with heavy index arithmetic per element.

    Contract: coefficients at out-of-map window cells must be zero (what
    `bin_window_coeffs` guarantees via its `ok` mask). Cotangents for
    those dead bins differ from the clamp-row autodiff values, but they
    are annihilated by the mask in the binning backward."""
    value, coeffs, base_yx = res
    b, h, w, c = value.shape
    hd = c // num_heads
    s = 2 * radius + 1
    l = coeffs.shape[1]
    vi = _interleave(value, num_heads)
    vflat = jnp.pad(
        vi.astype(jnp.bfloat16),
        ((0, 0), (radius, radius), (radius, radius), (0, 0)),
    )
    gi = _interleave(g, num_heads)  # transpose of the output deinterleave

    dd = _dot_dtype()
    e_sel = (
        jnp.arange(c, dtype=jnp.int32)[:, None] % num_heads
        == jnp.arange(num_heads, dtype=jnp.int32)[None, :]
    ).astype(dd)

    def da_body(args):
        g_c, base_c = args  # [B, chunk, C], [B, chunk, 2]
        patch = _gather_patches_runs(vflat, base_c, h, s, num_heads)
        patch = patch.reshape(b, g_c.shape[1], s * s, c)
        # dA[b,q,n,o] = Σ_c patch[b,q,o,c] · g[b,q,c] · E[c,n]: fold the
        # head selection into the (small) cotangent and contract channels
        # as one MXU matmul (same no-relayout rationale as the forward)
        g2 = g_c.astype(dd)[..., None] * e_sel  # [B, chunk, C, NH]
        da_t = jax.lax.dot_general(
            patch.astype(dd), g2,
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [B, chunk, S², NH]
        return da_t.swapaxes(2, 3)  # [B, chunk, NH, S²]

    pad_l = (-l) % chunk
    g_p = jnp.pad(gi, ((0, 0), (0, pad_l), (0, 0)))
    base_p = jnp.pad(base_yx, ((0, 0), (0, pad_l), (0, 0)))
    n_chunks = (l + pad_l) // chunk
    g_ch = g_p.reshape(b, n_chunks, chunk, c).swapaxes(0, 1)
    b_ch = base_p.reshape(b, n_chunks, chunk, 2).swapaxes(0, 1)
    da = jax.lax.map(da_body, (g_ch, b_ch))  # [n_chunks, B, chunk, NH, S²]
    da = da.swapaxes(0, 1).reshape(b, n_chunks * chunk, num_heads, s * s)[:, :l]
    da = da.astype(coeffs.dtype)

    # dV: one [B, L, C] row scatter-add per window OFFSET (S² scan steps
    # into the y+x-padded flattened map; pad-cell contributions are sliced
    # off, matching the forward's zero-padded reads). History of the
    # alternatives (tools/bench_dv.py at exact decoder shapes): r3
    # dynamic-update-slice accumulation 1132 ms (XLA cannot alias
    # dynamic-index read-modify-write chains → full-buffer copies); the
    # r4.5 ROW-SLICE windowed scatter_add (S steps of [B, L, S·C] updates)
    # looked byte-optimal but XLA lowers a wide-window scatter with
    # colliding indices to a SERIAL while loop over all B·L update rows —
    # ~285 ms/layer, 80% of the whole ConQueR step in the r5 trace. The
    # per-offset narrow scatter measured 82 ms.
    hp, wp = h + 2 * radius, w + 2 * radius
    dv0 = jnp.zeros((b, hp * wp, c), jnp.float32)
    gi32 = gi.astype(jnp.float32)

    def dv_body(dv, o):
        oy, ox = o // s, o % s
        # window cell (oy, ox) of query at (y, x) sits at padded coords
        # (y + oy, x + ox) — always in bounds, no clipping needed
        rows = (base_yx[..., 0] + oy) * wp + (base_yx[..., 1] + ox)  # [B, L]
        a_o = coeffs[..., o].astype(jnp.float32)  # [B, L, NH]
        # interleaved channel layout: channel c belongs to head c % NH
        a_c = jnp.tile(a_o, (1, 1, hd))  # [B, L, C]
        dv = jax.vmap(lambda d, r, v: d.at[r].add(v))(dv, rows, a_c * gi32)
        return dv, None

    dv, _ = jax.lax.scan(dv_body, dv0, jnp.arange(s * s, dtype=jnp.int32))
    dv = dv.reshape(b, hp, wp, c)[:, radius:radius + h, radius:radius + w]
    dvalue = _deinterleave(dv, num_heads).astype(value.dtype)
    import numpy as _np

    dbase = _np.zeros(base_yx.shape, jax.dtypes.float0)
    return dvalue, da, dbase


_window_gather_runs.defvjp(_window_gather_runs_fwd, _window_gather_runs_bwd)


def box_attention_window_gather(
    value: jax.Array,    # [B, H, W, C]
    coeffs: jax.Array,   # [B, L, NH, S²]
    base_yx: jax.Array,  # [B, L, 2] int32
    *,
    num_heads: int,
    radius: int,
    chunk: int = 512,
    runs: bool = True,
) -> jax.Array:
    """Window attention for scattered queries (decoder cross-attention):
    gather each query's window around its anchor cell, then a fused
    weighted reduction. Chunked over queries to bound the patch buffer.

    runs=True (the fast path) gathers each window row as ONE contiguous
    (2R+1)-cell slice from an x-padded bf16 map (S slice descriptors of
    ~(2R+1)·C·2 bytes instead of S² 1KB row descriptors) and carries a
    custom VJP: dA as one MXU matmul per chunk, dV as S² per-offset
    [B, L, C] row scatter-adds. runs=False is the plain per-row autodiff
    oracle.

    Contract: `base_yx` must be IN-MAP (0 ≤ y < H, 0 ≤ x < W — what the
    model's anchor clip produces) and be the same anchors the coeffs were
    binned against. The runs path positions each window row as one slice
    from the anchor, so an out-of-map anchor would misalign every bin
    (the per-row oracle instead clamps each cell independently)."""
    base_yx = jnp.clip(
        base_yx,
        jnp.zeros((2,), jnp.int32),
        jnp.asarray([value.shape[1] - 1, value.shape[2] - 1], jnp.int32),
    )
    if runs:
        return _window_gather_runs(value, coeffs, base_yx, num_heads, radius, chunk)

    b, h, w, c = value.shape
    hd = c // num_heads
    offsets, s = _window_offsets(radius)
    l = coeffs.shape[1]
    vi = _interleave(value, num_heads)
    vflat2 = vi.reshape(b, h * w, c)
    off = jnp.asarray(offsets, jnp.int32)  # [S², 2] (dy, dx)

    def body(args):
        a_c, base_c = args  # [B, chunk, NH, S²], [B, chunk, 2]
        yy = jnp.clip(base_c[..., 0][:, :, None] + off[None, None, :, 0], 0, h - 1)
        xx = jnp.clip(base_c[..., 1][:, :, None] + off[None, None, :, 1], 0, w - 1)
        rows = (yy * w + xx).reshape(b, chunk * s * s)
        patch = jnp.take_along_axis(vflat2, rows[..., None], axis=1)
        patch = patch.reshape(b, chunk, s * s, c)
        a_exp = jnp.broadcast_to(
            a_c.swapaxes(2, 3)[:, :, :, None, :].astype(value.dtype),
            (b, chunk, s * s, hd, num_heads),
        ).reshape(b, chunk, s * s, c)
        return (a_exp * patch).sum(axis=2)  # [B, chunk, C]

    a_ch, b_ch, n_chunks = _chunked(coeffs, base_yx, chunk, s)
    out = jax.lax.map(body, (a_ch, b_ch))  # [n_chunks, B, chunk, C]
    out = out.swapaxes(0, 1).reshape(b, n_chunks * chunk, c)[:, :l]
    return _deinterleave(out.astype(value.dtype), num_heads)


def make_box_grids(
    ref_boxes: jax.Array,
    ref_angles: jax.Array,
    offset_boxes: jax.Array,
    offset_angles: jax.Array | None,
    kernel_indices: jax.Array,
) -> jax.Array:
    """Compute normalized sampling grids (reference `_where_to_attend`,
    `box_attention.py:62-95`).

    ref_boxes [B, L, 1|NH, NL, 4] (cx, cy, w, h in [0,1]),
    ref_angles [B, L, 1|NH, NL, 1] (normalized angle in [0,1] × 2π),
    offset_boxes [B, L, NH, NL, 4], offset_angles same or None,
    kernel_indices [P, 2] → grids [B, L, NH, NL, P, 2].
    """
    if offset_angles is not None:
        angles = (ref_angles + offset_angles / 16.0) * 2.0 * jnp.pi
    else:
        angles = ref_angles * 2.0 * jnp.pi
    boxes = ref_boxes + offset_boxes / 8.0 * ref_boxes[..., [2, 3, 2, 3]]
    center, size = boxes[..., :2], boxes[..., 2:]

    cos_a, sin_a = jnp.cos(angles), jnp.sin(angles)  # [..., 1]
    grid = kernel_indices * jax.nn.relu(size)[..., None, :]  # [..., P, 2]
    # row-vector rotation (reference rot_matrix [[c, -s], [s, c]] · grid)
    gx = grid[..., 0] * cos_a - grid[..., 1] * sin_a
    gy = grid[..., 0] * sin_a + grid[..., 1] * cos_a
    rotated = jnp.stack([gx, gy], axis=-1)
    return center[..., None, :] + rotated


def kernel_indices(kernel_size: int, dtype=jnp.float32) -> jax.Array:
    """[P, 2] (x, y) grid offsets in box-fraction units (reference
    `_create_kernel_indices`)."""
    if kernel_size % 2 == 0:
        start = -kernel_size // 2 + 0.5
        end = kernel_size // 2 - 0.5
    else:
        start = -(kernel_size - 1) // 2
        end = (kernel_size - 1) // 2
    idx = jnp.linspace(start, end, kernel_size, dtype=dtype)
    i, j = jnp.meshgrid(idx, idx, indexing="ij")
    return jnp.stack([j, i], axis=-1).reshape(-1, 2) / kernel_size
