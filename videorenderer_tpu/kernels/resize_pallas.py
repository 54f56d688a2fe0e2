"""Pallas banded-matmul resize kernels.

The weight matrix of a separable resize (videorenderer_tpu/ops/scale.py) is
*banded*: each output column depends on at most ``taps`` (≈ filter support x
scale) consecutive input columns.  A dense MXU matmul wastes ~(W_in / band)
of its FLOPs on zero blocks — 7-15x for the 4K chains.  These kernels
compute only the diagonal band:

 * host side: for every 128-wide output tile, find the 128-aligned input
   window [start_j, start_j + KB) covering its taps (Mosaic requires
   lane-dim slice offsets to be multiples of the tiling) and pack the
   weight band (J, KB, 128), pre-split into bfloat16 hi/lo halves;
 * device side: one grid step per input *stripe* (all input columns for
   TILE_R rows, resident in VMEM via BlockSpec — Pallas double-buffers the
   stream).  The kernel converts the stripe once (integer planes convert
   in-kernel via bitcast+mask; UNORM normalization is folded into the
   weights) and splits it exactly into bf16 hi + lo parts, then runs the
   unrolled output-tile loop with **three bf16 MXU passes** per tile:
   hi*w_hi + lo*w_hi + hi*w_lo — ~2^-16 relative error (only the lo*w_lo
   term is dropped), twice as fast as Precision.HIGHEST's six passes and
   far above the 55 dB PSNR bar.

This is the TPU-idiomatic replacement of the reference's per-pixel gather
loops (ps_convolution.hlsl:28-43, the interpolation shaders) for the hot
path; the plain-XLA dense matmul in ops/scale.py stays as the fallback
backend and the golden reference, and narrow diagonal bands take the
stencil path in ops/scale.py instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128                     # output tile (lane width)
_STRIPE_BYTES = 4 * 1024 * 1024  # VMEM budget for one input stripe


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_band_cache: dict = {}


def _pack_band(mat: np.ndarray, kb_align: int = 128,
               kb_force: int | None = None):
    """Band-pack one (in, out) matrix: per-output-tile input windows with
    128-aligned starts.  ``kb_force`` imposes a common window width so
    several packings can be stacked (per-shard weight selection)."""
    w_in, w_out = mat.shape
    w_in_pad = _round_up(w_in, kb_align)
    j_tiles = _round_up(w_out, TILE_N) // TILE_N
    nz_lo = np.full(j_tiles, w_in, np.int64)
    nz_hi = np.zeros(j_tiles, np.int64)
    nz_rows, nz_cols = np.nonzero(mat)
    for r, c in zip(nz_rows, nz_cols):
        j = c // TILE_N
        nz_lo[j] = min(nz_lo[j], r)
        nz_hi[j] = max(nz_hi[j], r + 1)
    starts = (np.maximum(nz_lo, 0) // kb_align) * kb_align  # align down
    widths = np.maximum(nz_hi - starts, 1)
    kb = kb_force if kb_force is not None else _round_up(int(widths.max()),
                                                         kb_align)
    kb = min(kb, w_in_pad)
    starts = np.minimum(starts, max(w_in_pad - kb, 0)).astype(np.int32)
    bands = np.zeros((j_tiles, kb, TILE_N), np.float32)
    for j in range(j_tiles):
        s = int(starts[j])
        cols = mat[s:s + kb, j * TILE_N:(j + 1) * TILE_N]
        bands[j, :cols.shape[0], :cols.shape[1]] = cols
    return starts, bands, kb, w_in_pad


def pack_band_for(mat: np.ndarray, kb_align: int = 128):
    """Cached :func:`_pack_band` (matrices are interned per plan)."""
    key = (id(mat), mat.shape, kb_align)
    cached = _band_cache.get(key)
    if cached is not None:
        return cached
    out = _pack_band(mat, kb_align)
    _band_cache[key] = out
    return out


def pack_band_stack(mats, pre_scale: float | None = None):
    """Pack a list of same-shape (in, out) matrices (one per shard) with a
    COMMON window width, returning stacked arrays for dynamic per-shard
    selection inside shard_map:

      starts (n, J) int32, w_hi/w_lo (n, J, 128, KB) bfloat16 — already
      transposed for the left-matmul rows kernel — plus (kb, in_pad).
    """
    kb = 0
    for m in mats:
        kb = max(kb, _pack_band(np.asarray(m), kb_align=ROWS_KB_ALIGN)[2])
    starts_l, hi_l, lo_l = [], [], []
    in_pad = None
    for m in mats:
        s, bands, _, in_pad = _pack_band(np.asarray(m),
                                         kb_align=ROWS_KB_ALIGN, kb_force=kb)
        if pre_scale is not None:
            bands = bands * np.float32(pre_scale)
        bt = np.ascontiguousarray(np.swapaxes(bands, 1, 2))  # (J, 128, KB)
        hi, lo = _split_bf16(bt)
        starts_l.append(s)
        hi_l.append(hi)
        lo_l.append(lo)
    return (np.stack(starts_l), np.stack(hi_l), np.stack(lo_l),
            min(kb, in_pad), in_pad)


def _split_bf16(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    import ml_dtypes
    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _pick_tile(span_bytes_per_row: int, preferred: int, align: int,
               total: int | None = None) -> int:
    """Largest row-tile (multiple of ``align``) whose stripe fits the VMEM
    budget; when ``total`` is given, prefer a tile that divides it exactly so
    no padded copy of the input is materialized."""
    cap = preferred
    while cap > align and cap * span_bytes_per_row > _STRIPE_BYTES:
        cap //= 2
    cap = max(cap, align)
    if total is not None and total % align == 0:
        for t in range(cap, align - 1, -align):
            if total % t == 0:
                return t
    return cap


def _u16_to_f32(v):
    """Mosaic has no direct uint16->float32 cast; bitcast to int16, widen,
    and mask off the sign extension."""
    i16 = pltpu.bitcast(v, jnp.int16)
    return jax.lax.bitwise_and(i16.astype(jnp.int32),
                               jnp.int32(0xFFFF)).astype(jnp.float32)


def _u8_to_f32(v):
    i8 = pltpu.bitcast(v, jnp.int8)
    return jax.lax.bitwise_and(i8.astype(jnp.int32),
                               jnp.int32(0xFF)).astype(jnp.float32)


def _to_f32(val):
    dt = val.dtype
    if dt == jnp.uint16.dtype:
        return _u16_to_f32(val)
    if dt == jnp.uint8.dtype:
        return _u8_to_f32(val)
    return val


def _dot3(a_hi, a_lo, w_hi, w_lo, left: bool = False):
    """3-pass bf16 product with f32 accumulation: hi*w_hi + lo*w_hi + hi*w_lo
    (the dropped lo*w_lo term is ~2^-16 relative)."""
    kw = dict(preferred_element_type=jnp.float32)
    if left:
        return (jnp.dot(w_hi, a_hi, **kw) + jnp.dot(w_hi, a_lo, **kw)
                + jnp.dot(w_lo, a_hi, **kw))
    return (jnp.dot(a_hi, w_hi, **kw) + jnp.dot(a_lo, w_hi, **kw)
            + jnp.dot(a_hi, w_lo, **kw))


def _kernel_cols(starts_ref, x_ref, whi_ref, wlo_ref, o_ref, hi_ref, lo_ref):
    xf = _to_f32(x_ref[:])
    hi_ref[:] = xf.astype(jnp.bfloat16)
    lo_ref[:] = (xf - hi_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    kb = whi_ref.shape[1]
    for j in range(whi_ref.shape[0]):
        start = pl.multiple_of(starts_ref[j], 128)
        o_ref[:, j * TILE_N:(j + 1) * TILE_N] = _dot3(
            hi_ref[:, pl.ds(start, kb)], lo_ref[:, pl.ds(start, kb)],
            whi_ref[j], wlo_ref[j])


def banded_resize_last_axis(x: jnp.ndarray, mat: np.ndarray,
                            pre_scale: float | None = None) -> jnp.ndarray:
    """Resize along the last axis.  ``x``: (..., W_in) float32 or raw
    uint8/uint16 planes (with ``pre_scale`` folding the UNORM normalization
    into the weights).  Returns float32 (..., W_out)."""
    w_in, w_out = mat.shape
    assert x.shape[-1] == w_in
    starts, bands, kb, w_in_pad = pack_band_for(mat)
    if pre_scale is not None:
        bands = bands * np.float32(pre_scale)
    w_hi, w_lo = _split_bf16(bands)
    j_tiles = bands.shape[0]

    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(rows, w_in)
    if x2.dtype not in (jnp.uint8.dtype, jnp.uint16.dtype, jnp.float32.dtype):
        x2 = x2.astype(jnp.float32)
    tile_r = _pick_tile(w_in_pad * (x2.dtype.itemsize + 4), 256, 32,
                        total=rows)
    rows_pad = _round_up(rows, tile_r)
    if rows_pad != rows or w_in_pad != w_in:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, w_in_pad - w_in)))

    out = pl.pallas_call(
        _kernel_cols,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows_pad // tile_r,),
            in_specs=[
                pl.BlockSpec((tile_r, w_in_pad), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((j_tiles, kb, TILE_N), lambda i, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((j_tiles, kb, TILE_N), lambda i, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_r, j_tiles * TILE_N),
                                   lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tile_r, w_in_pad), jnp.bfloat16),
                pltpu.VMEM((tile_r, w_in_pad), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, j_tiles * TILE_N),
                                       jnp.float32),
    )(jnp.asarray(starts), x2, jnp.asarray(w_hi), jnp.asarray(w_lo))

    out = out[:rows, :w_out]
    return out.reshape(lead + (w_out,))


# The H-axis window slices live in the SUBLANE dim, where Mosaic only needs
# 16-alignment (bf16 tile is (16, 128)) — unlike the W kernel's lane-dim
# slices (128).  Narrower windows cut the per-output-tile K (and so MXU
# work) by ~30% for 2:1 downscales vs 128-aligned packing.
ROWS_KB_ALIGN = 16


def _kernel_rows(starts_ref, x_ref, whi_ref, wlo_ref, o_ref, hi_ref, lo_ref):
    xf = _to_f32(x_ref[0])
    hi_ref[:] = xf.astype(jnp.bfloat16)
    lo_ref[:] = (xf - hi_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    kb = whi_ref.shape[2]
    for jr in range(whi_ref.shape[0]):
        start = pl.multiple_of(starts_ref[jr], ROWS_KB_ALIGN)
        o_ref[0, jr * TILE_N:(jr + 1) * TILE_N, :] = _dot3(
            hi_ref[pl.ds(start, kb), :], lo_ref[pl.ds(start, kb), :],
            whi_ref[jr], wlo_ref[jr], left=True)


def banded_resize_rows(x: jnp.ndarray, mat: np.ndarray,
                       pre_scale: float | None = None) -> jnp.ndarray:
    """Resize along the second-to-last (H) axis without transposing:
    out[.., m, w] = sum_r mat[r, m] * x[.., r, w] via a left matmul with the
    transposed weight band over a full-height column stripe in VMEM."""
    h_in, h_out = mat.shape
    assert x.shape[-2] == h_in
    starts, bands, kb, h_in_pad = pack_band_for(mat, kb_align=ROWS_KB_ALIGN)
    if pre_scale is not None:
        bands = bands * np.float32(pre_scale)
    bands_t = np.ascontiguousarray(np.swapaxes(bands, 1, 2))  # (J, 128, KB)
    w_hi, w_lo = _split_bf16(bands_t)
    return banded_resize_rows_packed(x, starts, w_hi, w_lo, h_out, h_in_pad)


def banded_resize_rows_packed(x: jnp.ndarray, starts, w_hi, w_lo,
                              h_out: int, h_in_pad: int) -> jnp.ndarray:
    """Rows kernel on pre-packed band weights.  ``starts`` (J,) int32 and
    ``w_hi``/``w_lo`` (J, 128, KB) bfloat16 may be traced arrays — e.g. one
    shard's slice of a :func:`pack_band_stack`, selected by
    ``jax.lax.axis_index`` inside shard_map — so one compiled kernel serves
    every shard of a row-sharded frame."""
    h_in = x.shape[-2]
    jr_tiles, _, kb = w_hi.shape
    lead = x.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    w = x.shape[-1]
    x3 = x.reshape(l, h_in, w)
    if x3.dtype not in (jnp.uint8.dtype, jnp.uint16.dtype, jnp.float32.dtype):
        x3 = x3.astype(jnp.float32)
    tile_w = _pick_tile(h_in_pad * (x3.dtype.itemsize + 4), 512, 128,
                        total=w)
    w_pad = _round_up(w, tile_w)
    if h_in_pad != h_in or w_pad != w:
        x3 = jnp.pad(x3, ((0, 0), (0, h_in_pad - h_in), (0, w_pad - w)))

    out = pl.pallas_call(
        _kernel_rows,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(l, w_pad // tile_w),
            in_specs=[
                pl.BlockSpec((1, h_in_pad, tile_w),
                             lambda b, wt, s: (b, 0, wt),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((jr_tiles, TILE_N, kb), lambda b, wt, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((jr_tiles, TILE_N, kb), lambda b, wt, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, jr_tiles * TILE_N, tile_w),
                                   lambda b, wt, s: (b, 0, wt),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((h_in_pad, tile_w), jnp.bfloat16),
                pltpu.VMEM((h_in_pad, tile_w), jnp.bfloat16),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((l, jr_tiles * TILE_N, w_pad),
                                       jnp.float32),
    )(jnp.asarray(starts), x3, jnp.asarray(w_hi), jnp.asarray(w_lo))

    out = out[:, :h_out, :w]
    return out.reshape(lead + (h_out, w))


def banded_resize_axis(x: jnp.ndarray, mat: np.ndarray, axis: int,
                       pre_scale: float | None = None) -> jnp.ndarray:
    """Banded resize along the last (W) or second-to-last (H) axis."""
    if axis in (-1, x.ndim - 1):
        return banded_resize_last_axis(x, mat, pre_scale)
    if axis in (-2, x.ndim - 2):
        return banded_resize_rows(x, mat, pre_scale)
    raise ValueError(f"unsupported axis {axis}")


# ---------------------------------------------------------------------------
# fused 3-plane H-resize + color-matrix + tail kernel
# ---------------------------------------------------------------------------
#
# Profiling the headline chain (4K HDR10->SDR) showed every elementwise
# XLA pass over the output-size array costs ~220 us/frame at batch 64 —
# bandwidth/pass-count bound, not compute bound: cmat mix 298 us, the
# PQ->tonemap->gamut->gamma->dither tail 451 us, vs 526 us for ALL the
# banded resizes.  This kernel removes those passes entirely: one grid
# walks column stripes of the three W-passed planes, performs each plane's
# banded H matmul in VMEM, then applies the color matrix and the plan's
# entire nonlinear tail (a traced `epilogue` closure — trace-as-codegen,
# like the pipeline itself) and writes only the final output.  Per frame
# the HBM traffic drops from ~8 output-size passes to read-3-planes +
# write-1-result.


def _split_stripe(xf, hi_ref, lo_ref):
    hi_ref[:] = xf.astype(jnp.bfloat16)
    lo_ref[:] = (xf - hi_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)


def _make_rows3_kernel(n_tiles: int, has_y: bool, has_c: bool, epilogue,
                       y_scale: float | None, c_scale: float | None):
    """Kernel factory: per grid step convert/split each plane's column
    stripe once, loop the output row tiles running the banded H dot per
    plane (or a direct slice when that plane has no H matrix), apply the
    epilogue to the (3, 128, tile_w) block and write the final tile."""

    def kernel(sy_ref, sc_ref, *refs):
        i = 0
        y_ref, u_ref, v_ref = refs[0], refs[1], refs[2]
        i = 3
        if has_y:
            wyh, wyl = refs[i], refs[i + 1]
            i += 2
        if has_c:
            wch, wcl = refs[i], refs[i + 1]
            i += 2
        o_ref = refs[i]
        scr = refs[i + 1:]
        si = 0
        if has_y:
            yhi, ylo = scr[si], scr[si + 1]
            si += 2
            _split_stripe(_to_f32(y_ref[0]), yhi, ylo)
            kby = wyh.shape[2]
        if has_c:
            uhi, ulo = scr[si], scr[si + 1]
            vhi, vlo = scr[si + 2], scr[si + 3]
            si += 4
            _split_stripe(_to_f32(u_ref[0]), uhi, ulo)
            _split_stripe(_to_f32(v_ref[0]), vhi, vlo)
            kbc = wch.shape[2]

        for jr in range(n_tiles):
            if has_y:
                ys = pl.multiple_of(sy_ref[jr], ROWS_KB_ALIGN)
                y = _dot3(yhi[pl.ds(ys, kby)], ylo[pl.ds(ys, kby)],
                          wyh[jr], wyl[jr], left=True)
            else:
                y = _to_f32(y_ref[0, pl.ds(jr * TILE_N, TILE_N), :])
                if y_scale is not None:
                    y = y * jnp.float32(y_scale)
            if has_c:
                cs = pl.multiple_of(sc_ref[jr], ROWS_KB_ALIGN)
                u = _dot3(uhi[pl.ds(cs, kbc)], ulo[pl.ds(cs, kbc)],
                          wch[jr], wcl[jr], left=True)
                v = _dot3(vhi[pl.ds(cs, kbc)], vlo[pl.ds(cs, kbc)],
                          wch[jr], wcl[jr], left=True)
            else:
                u = _to_f32(u_ref[0, pl.ds(jr * TILE_N, TILE_N), :])
                v = _to_f32(v_ref[0, pl.ds(jr * TILE_N, TILE_N), :])
                if c_scale is not None:
                    u = u * jnp.float32(c_scale)
                    v = v * jnp.float32(c_scale)
            rgb = epilogue(y, u, v)
            o_ref[0, :, pl.ds(jr * TILE_N, TILE_N), :] = rgb

    return kernel


def rows3_tail(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               my_y: np.ndarray | None, my_c: np.ndarray | None,
               h_out: int, epilogue,
               y_scale: float | None = None,
               c_scale: float | None = None) -> jnp.ndarray:
    """H-resize the (luma, chroma, chroma) planes, mix and run the tail.

    ``y``: (..., Hy, W); ``u``/``v``: (..., Hc, W) — float32 (W-passed) or
    raw integer planes.  ``my_y`` (Hy, h_out) / ``my_c`` (Hc, h_out): banded
    H matrices, or None when that plane needs no H resize (then Hy/Hc must
    equal h_out and ``y_scale``/``c_scale`` normalize raw integers).
    ``epilogue``: traced fn (y, u, v) each (128, tile_w) f32 ->
    (3, 128, tile_w) f32 — the color matrix + corrections + tone map +
    dither chain.  Returns (..., 3, h_out, W) float32.
    """
    lead = y.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    w = y.shape[-1]
    assert u.shape[-1] == w and v.shape[-1] == w
    hy, hc = y.shape[-2], u.shape[-2]
    n_tiles = _round_up(h_out, TILE_N) // TILE_N
    h_out_pad = n_tiles * TILE_N

    def prep(mat, h_in, pre_scale):
        if mat is None:
            return None, max(_round_up(h_in, ROWS_KB_ALIGN), h_out_pad)
        starts, bands, kb, h_pad = pack_band_for(mat, kb_align=ROWS_KB_ALIGN)
        if pre_scale is not None:
            bands = bands * np.float32(pre_scale)
        bt = np.ascontiguousarray(np.swapaxes(bands, 1, 2))
        w_hi, w_lo = _split_bf16(bt)
        return (starts, w_hi, w_lo, kb), h_pad

    y_pack, hy_pad = prep(my_y, hy, y_scale)
    c_pack, hc_pad = prep(my_c, hc, c_scale)
    if my_y is not None:
        y_scale = None     # folded into the weights
    if my_c is not None:
        c_scale = None

    def prep_plane(p, h_in, h_pad, tile_w, w_pad):
        p3 = p.reshape(l, h_in, w)
        if p3.dtype not in (jnp.uint8.dtype, jnp.uint16.dtype,
                            jnp.float32.dtype):
            p3 = p3.astype(jnp.float32)
        if h_pad != h_in or w_pad != w:
            p3 = jnp.pad(p3, ((0, 0), (0, h_pad - h_in), (0, w_pad - w)))
        return p3

    # VMEM: stripes f32 + bf16 hi/lo for planes with matrices, the out
    # block and the weight bands — tile_w 128 keeps it ~12 MB at 4K.
    tile_w = 128
    w_pad = _round_up(w, tile_w)
    y3 = prep_plane(y, hy, hy_pad, tile_w, w_pad)
    u3 = prep_plane(u, hc, hc_pad, tile_w, w_pad)
    v3 = prep_plane(v, hc, hc_pad, tile_w, w_pad)

    imap3 = lambda b, wt, s1, s2: (b, 0, wt)
    in_specs = [
        pl.BlockSpec((1, hy_pad, tile_w), imap3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hc_pad, tile_w), imap3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hc_pad, tile_w), imap3, memory_space=pltpu.VMEM),
    ]
    inputs = [y3, u3, v3]
    scratch = []
    wmap = lambda b, wt, s1, s2: (0, 0, 0)
    if y_pack is not None:
        starts_y, wyh, wyl, kby = y_pack
        in_specs += [pl.BlockSpec((n_tiles, TILE_N, kby), wmap,
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [jnp.asarray(wyh), jnp.asarray(wyl)]
        scratch += [pltpu.VMEM((hy_pad, tile_w), jnp.bfloat16)] * 2
        sy = np.asarray(starts_y, np.int32)
    else:
        sy = np.zeros(n_tiles, np.int32)
    if c_pack is not None:
        starts_c, wch, wcl, kbc = c_pack
        in_specs += [pl.BlockSpec((n_tiles, TILE_N, kbc), wmap,
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [jnp.asarray(wch), jnp.asarray(wcl)]
        scratch += [pltpu.VMEM((hc_pad, tile_w), jnp.bfloat16)] * 4
        sc = np.asarray(starts_c, np.int32)
    else:
        sc = np.zeros(n_tiles, np.int32)

    kernel = _make_rows3_kernel(n_tiles, y_pack is not None,
                                c_pack is not None, epilogue,
                                y_scale, c_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(l, w_pad // tile_w),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 3, h_out_pad, tile_w),
                                   lambda b, wt, s1, s2: (b, 0, 0, wt),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((l, 3, h_out_pad, w_pad), jnp.float32),
    )(jnp.asarray(sy), jnp.asarray(sc), *inputs)

    out = out[:, :, :h_out, :w]
    return out.reshape(lead + (3, h_out, w))
