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

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128                     # output tile (lane width)
_STRIPE_BYTES = 4 * 1024 * 1024  # VMEM budget for one input stripe

# v5e has 128 MB of VMEM; the 16 MB scoped-vmem ceiling is a compiler
# default, not hardware, and CAN be raised per kernel.  A full sweep was
# measured on hardware (2026-08-19): 96 MB limit + 4-8x bigger tiles was
# NEUTRAL on the headline chain (micro A/B 0.443 vs 0.447 ms), cost 2-6%
# on every 4K-out / spatial config (c4 -5%, c6 -3%, c7 -2%, c9 -6%), and
# crashed the Mosaic compile of the deint/DoVi tails (c5/c5s/c8) — so the
# DEFAULTS stay at the proven compiler-default footprint; the env knobs
# remain for future per-kernel experiments.
_VMEM_LIMIT_BYTES = int(os.environ.get("VRT_VMEM_MB", "16")) * 2**20
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)
_WPASS_TILE_R = int(os.environ.get("VRT_WPASS_TILE_R", "256"))
_ROWS_TILE_W = int(os.environ.get("VRT_ROWS_TILE_W", "512"))
_ROWS3_TILE_W = int(os.environ.get("VRT_ROWS3_TILE_W", "128"))


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


# Leave headroom under the per-kernel scoped-vmem limit for Mosaic's
# staging: measured actual scoped usage runs ~1.4x the modeled double-
# buffered footprint (67.4 MB vs 48.7 modeled for the 4K luma W pass at
# tile_r=1024).  At the default 16 MB limit this reproduces the proven
# 14 MB budget; raised limits budget half.
_SCOPED_VMEM_BUDGET = max(14 * 2**20, _VMEM_LIMIT_BYTES // 2) \
    if _VMEM_LIMIT_BYTES >= 16 * 2**20 else _VMEM_LIMIT_BYTES // 2


def _pick_tile_vmem(io_bytes_per_row: int, scratch_bytes_per_row: int,
                    weight_bytes: int, preferred: int, align: int,
                    total: int | None = None) -> int:
    """Largest tile that keeps the kernel's whole scoped-VMEM footprint —
    double-buffered in/out blocks (2x io span), persistent scratch, and the
    resident weight bands — under budget.  Counting only the input stripe
    (the old heuristic) overran the 16 MB limit on wide upscales where the
    f32 output block dominates (e.g. 1:1 4K chroma W, 1920->3840)."""
    need = lambda t: t * (2 * io_bytes_per_row + scratch_bytes_per_row) \
        + weight_bytes
    cap = preferred
    while cap > align and need(cap) > _SCOPED_VMEM_BUDGET:
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
    if dt == jnp.int16.dtype:
        # compact W-pass intermediate (MID16 fixed point): sign-extend;
        # the 1/MID16_SCALE unscale folds into the consumer's weights
        return val.astype(jnp.int32).astype(jnp.float32)
    return val


# Compact-intermediate fixed point: W-passed planes store
# round(value * 16384) as int16.  Values are normalized [0,1] plus filter
# over/undershoot (Lanczos3 column L1 norm keeps them within about
# [-0.3, 1.3]; callers must guard max column L1 * SCALE <= 32767 — the
# pipeline checks this host-side and falls back to f32 intermediates for
# exotic filters).  The quantization step is 2^-14
# of full scale — a ~95 dB noise floor, far above the 55 dB PSNR gate and
# ~16x finer than the reference's default 10-bit UNORM intermediate
# textures (TEXFMT_AUTOINT, Source/DX11VideoProcessor.cpp:1145-1151) and
# ~4x finer than its opt-in fp16 at mid-gray.  Halves intermediate HBM
# traffic vs float32.
MID16_SCALE = 16384.0


def _quant_mid16(x):
    # f32 -> int16 via int32 (Mosaic has no direct f32->int16 cast);
    # round-nearest keeps the quantizer unbiased
    return jnp.round(x * MID16_SCALE).astype(jnp.int32).astype(jnp.int16)


def _dot3(a_hi, a_lo, w_hi, w_lo, left: bool = False):
    """3-pass bf16 product with f32 accumulation: hi*w_hi + lo*w_hi + hi*w_lo
    (the dropped lo*w_lo term is ~2^-16 relative)."""
    kw = dict(preferred_element_type=jnp.float32)
    if left:
        return (jnp.dot(w_hi, a_hi, **kw) + jnp.dot(w_hi, a_lo, **kw)
                + jnp.dot(w_lo, a_hi, **kw))
    return (jnp.dot(a_hi, w_hi, **kw) + jnp.dot(a_lo, w_hi, **kw)
            + jnp.dot(a_hi, w_lo, **kw))


def _make_kernel_cols(mid16: bool):
    def kernel(starts_ref, x_ref, whi_ref, wlo_ref, o_ref, hi_ref, lo_ref):
        xf = _to_f32(x_ref[:])
        hi_ref[:] = xf.astype(jnp.bfloat16)
        lo_ref[:] = (xf - hi_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        kb = whi_ref.shape[1]
        for j in range(whi_ref.shape[0]):
            start = pl.multiple_of(starts_ref[j], 128)
            r = _dot3(hi_ref[:, pl.ds(start, kb)], lo_ref[:, pl.ds(start, kb)],
                      whi_ref[j], wlo_ref[j])
            o_ref[:, j * TILE_N:(j + 1) * TILE_N] = \
                _quant_mid16(r) if mid16 else r
    return kernel


_kernel_cols = _make_kernel_cols(False)


def banded_resize_last_axis(x: jnp.ndarray, mat: np.ndarray,
                            pre_scale: float | None = None,
                            mid16: bool = False) -> jnp.ndarray:
    """Resize along the last axis.  ``x``: (..., W_in) float32 or raw
    uint8/uint16 planes (with ``pre_scale`` folding the UNORM normalization
    into the weights).  Returns float32 (..., W_out), or with ``mid16``
    an int16 plane of round(value * MID16_SCALE) — the compact W-pass
    intermediate for the fused two-stage path."""
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
    o_itemsize = 2 if mid16 else 4
    tile_r = _pick_tile_vmem(
        w_in_pad * x2.dtype.itemsize + j_tiles * TILE_N * o_itemsize,
        w_in_pad * 4,                                          # hi/lo scratch
        j_tiles * kb * TILE_N * 2 * 2, _WPASS_TILE_R, 32, total=rows)
    rows_pad = _round_up(rows, tile_r)
    if rows_pad != rows or w_in_pad != w_in:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, w_in_pad - w_in)))

    out = pl.pallas_call(
        _make_kernel_cols(mid16) if mid16 else _kernel_cols,
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
                                       jnp.int16 if mid16 else jnp.float32),
        compiler_params=_COMPILER_PARAMS,
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
    if x3.dtype not in (jnp.uint8.dtype, jnp.uint16.dtype, jnp.int16.dtype,
                        jnp.float32.dtype):
        x3 = x3.astype(jnp.float32)
    tile_w = _pick_tile_vmem(
        h_in_pad * x3.dtype.itemsize + jr_tiles * TILE_N * 4,  # in + out
        h_in_pad * 4,                                          # hi/lo scratch
        jr_tiles * TILE_N * kb * 2 * 2, _ROWS_TILE_W, 128, total=w)
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
        compiler_params=_COMPILER_PARAMS,
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


def pack_surface_tiles(rgb, fmt: str):
    """Pack a (3, ...) float [0,1] block into int32 surface dwords — the
    swap-chain backbuffer format analogue (R10G10B10A2 / RGBA8,
    Source/DX11VideoProcessor.cpp:1490-1530 chooses these).  Mosaic has no
    f32->u8/u16 cast, but f32->int32 + shifts/ors legalize fine; the dword
    surface is also 3x less HBM write traffic than planar f32 RGB."""
    r, g, b = rgb[0], rgb[1], rgb[2]
    if fmt == "rgb10a2":
        q = lambda x: (jnp.clip(x, 0.0, 1.0) * 1023.0 + 0.5).astype(jnp.int32)
        # A2 = 3 (opaque): bits 30-31 -> 0xC0000000 as int32
        return q(r) | (q(g) << 10) | (q(b) << 20) | jnp.int32(-1073741824)
    if fmt == "rgba8":
        q = lambda x: (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.int32)
        return q(r) | (q(g) << 8) | (q(b) << 16) | jnp.int32(-16777216)
    raise ValueError(f"unknown surface format {fmt!r}")


def _make_rows3_kernel(n_tiles: int, has_y: bool, has_c: bool, epilogue,
                       y_scale: float | None, c_scale: float | None,
                       has_rt: bool = False, pack_format: str | None = None):
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
        rt_ref = None
        if has_rt:
            rt_ref = refs[i]
            i += 1
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

        def dots(jr):
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
            return y, u, v

        cur = dots(0)
        for jr in range(n_tiles):
            # software pipelining: issue tile jr+1's banded H dots (MXU)
            # before tile jr's epilogue (VPU transfer/tone-map/dither chain)
            # so both units stay busy
            nxt = dots(jr + 1) if jr + 1 < n_tiles else None
            y, u, v = cur
            rgb = (epilogue(y, u, v, rt_ref) if has_rt
                   else epilogue(y, u, v))
            if pack_format is not None:
                o_ref[0, pl.ds(jr * TILE_N, TILE_N), :] = \
                    pack_surface_tiles(rgb, pack_format)
            else:
                o_ref[0, :, pl.ds(jr * TILE_N, TILE_N), :] = rgb
            cur = nxt

    return kernel


# ---------------------------------------------------------------------------
# whole-pipeline mega kernel: W-pass + H-pass + color matrix + tail
# ---------------------------------------------------------------------------
#
# rows3_tail still reads/writes the three W-passed float planes (~66 MB per
# 4K frame of pure intermediate traffic).  This kernel removes even that:
# raw integer planes stream in, and per (column-tile, row-tile) both banded
# resize contractions, the color matrix and the plan's tail run in VMEM.
# Per frame the chip touches HBM exactly twice: the (possibly lane-shifted)
# source and the final output.
#
# MEASURED NEGATIVE RESULT (kept for the record): on the headline 4K chain
# this kernel reached 995 f/s vs 1408 for banded-W-kernels + rows3_tail —
# the W pass recomputed per row tile (+19% MXU) and the serialized
# convert->W->split->H chains inside each grid step stall the MXU more
# than the saved ~66 MB/frame of intermediate traffic buys.  The pipeline
# therefore uses the two-stage structure; this stays as the starting point
# for a software-pipelined revision.
#
# Column windows: an output column tile's input window starts anywhere, but
# streamed blocks sit at 128-lane boundaries — so the source is laid out as
# lane-shifted copies (shifts in {0,32,64,96}, usually one per plane) and
# each tile's scalar-prefetched block index lands its window within
# ceil(width/128) blocks (same trick as kernels/jinc2_pallas.py).
# Row windows are sublane slices (16-aligned) of the full-height stripe.


def _plan_col_windows(mat: np.ndarray, out_size: int, in_size: int):
    """Per-output-col-tile windows of a banded (in, out) matrix: returns
    (shifts, block_index (n_t, nb), kbw, bands (n_t, kbw, TILE_N) with the
    window-local column layout)."""
    n_t = _round_up(out_size, TILE_N) // TILE_N
    nz_lo = np.full(n_t, in_size, np.int64)
    nz_hi = np.zeros(n_t, np.int64)
    for rr, cc in zip(*np.nonzero(mat)):
        t = cc // TILE_N
        nz_lo[t] = min(nz_lo[t], rr)
        nz_hi[t] = max(nz_hi[t], rr + 1)
    nz_lo = np.minimum(nz_lo, np.maximum(nz_hi - 1, 0))
    shifts, shift_of, bstart, loc0 = [], [], [], []
    for t in range(n_t):
        lo = int(nz_lo[t])
        sig = (lo % TILE_N) - (lo % 32)
        if sig not in shifts:
            shifts.append(sig)
        b = (lo - sig) // TILE_N * TILE_N
        shift_of.append(sig)
        bstart.append(b)
        loc0.append(lo - (b + sig))
    kbw = _round_up(int(max(h - l + l0 for h, l, l0 in
                            zip(nz_hi, nz_lo, loc0))), TILE_N)
    shifts.sort()
    sidx = {s: i for i, s in enumerate(shifts)}
    w_pad = _round_up(in_size, TILE_N)
    w_blocks = w_pad // TILE_N
    nb = kbw // TILE_N
    cs = np.zeros((n_t, nb), np.int32)
    bands = np.zeros((n_t, kbw, TILE_N), np.float32)
    for t in range(n_t):
        base_block = sidx[shift_of[t]] * w_blocks + bstart[t] // TILE_N
        for i in range(nb):
            cs[t, i] = min(base_block + i, len(shifts) * w_blocks - 1)
        src0 = bstart[t] + shift_of[t]
        blk = mat[src0:src0 + kbw, t * TILE_N:(t + 1) * TILE_N]
        bands[t, :blk.shape[0], :blk.shape[1]] = blk
    return tuple(shifts), cs, kbw, bands


def _plan_row_windows(mat: np.ndarray, out_size: int, in_pad: int):
    """Per-output-row-tile windows: (rs (static tuple), rh,
    a_bands (n_t, TILE_N, rh) transposed for the left dot)."""
    in_size = mat.shape[0]
    n_t = _round_up(out_size, TILE_N) // TILE_N
    nz_lo = np.full(n_t, in_size, np.int64)
    nz_hi = np.zeros(n_t, np.int64)
    for rr, cc in zip(*np.nonzero(mat)):
        t = cc // TILE_N
        nz_lo[t] = min(nz_lo[t], rr)
        nz_hi[t] = max(nz_hi[t], rr + 1)
    nz_lo = np.minimum(nz_lo, np.maximum(nz_hi - 1, 0))
    rs = [min(int(lo) // 16 * 16, max(in_pad - 16, 0)) for lo in nz_lo]
    rh = min(_round_up(int(max(h - s for h, s in zip(nz_hi, rs))), 16),
             in_pad)
    rs = [min(s, in_pad - rh) for s in rs]
    bands = np.zeros((n_t, TILE_N, rh), np.float32)
    for t in range(n_t):
        blk = mat[rs[t]:rs[t] + rh, t * TILE_N:(t + 1) * TILE_N]
        bands[t, :blk.shape[1], :blk.shape[0]] = blk.T
    return tuple(rs), rh, bands


class _MegaPlane:
    """Per-plane static plan + packed weights for the mega kernel."""

    def __init__(self, mx, my, in_h, in_w, out_h_pad, norm):
        self.has_w = mx is not None
        self.has_h = my is not None
        self.h_pad = max(_round_up(in_h, 16),
                         out_h_pad if not self.has_h else 0)
        self.w_pad = _round_up(in_w, TILE_N)
        # normalization folds into whichever matrix streams the raw plane
        wscale = norm if (norm is not None and self.has_w) else None
        hscale = norm if (norm is not None and not self.has_w
                          and self.has_h) else None
        self.raw_scale = norm if (norm is not None and not self.has_w
                                  and not self.has_h) else None
        if self.has_w:
            mxf = np.asarray(mx, np.float32)
            if wscale is not None:
                mxf = mxf * np.float32(wscale)
            self.shifts, self.cs, self.kbw, bands = _plan_col_windows(
                mxf, mxf.shape[1], in_w)
            self.bwh, self.bwl = _split_bf16(bands)
        else:
            self.shifts, self.kbw = (0,), TILE_N
            n_wt = self.w_pad // TILE_N
            self.cs = np.arange(n_wt, dtype=np.int32)[:, None]
        self.nb = self.kbw // TILE_N
        if self.has_h:
            myf = np.asarray(my, np.float32)
            if hscale is not None:
                myf = myf * np.float32(hscale)
            n_jr = out_h_pad // TILE_N
            self.rs, self.rh, a = _plan_row_windows(
                myf, n_jr * TILE_N, self.h_pad)
            self.awh, self.awl = _split_bf16(a)
        else:
            self.rh = TILE_N

    def make_xcat(self, p3):
        """Lane-shifted copies of the padded raw plane, lane-concatenated."""
        in_h, in_w = p3.shape[-2], p3.shape[-1]
        if self.h_pad != in_h or self.w_pad != in_w:
            p3 = jnp.pad(p3, ((0, 0), (0, self.h_pad - in_h),
                              (0, self.w_pad - in_w)))
        parts = [p3 if s == 0 else
                 jnp.pad(p3[:, :, s:], ((0, 0), (0, 0), (0, s)))
                 for s in self.shifts]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)


def _mega_plane_tile(blocks, pp: _MegaPlane, jr: int, scr_h, scr_l,
                     bwh, bwl, awh, awl):
    """One plane's (128, TILE_N) output tile: W dot on the row window of
    the raw blocks, then the H dot (either may be a direct slice)."""
    rs = pp.rs[jr] if pp.has_h else jr * TILE_N
    if pp.has_w:
        for i in range(pp.nb):
            xf = _to_f32(blocks[i][0, pl.ds(rs, pp.rh), :])
            scr_h[:, i * TILE_N:(i + 1) * TILE_N] = xf.astype(jnp.bfloat16)
            scr_l[:, i * TILE_N:(i + 1) * TILE_N] = (
                xf - scr_h[:, i * TILE_N:(i + 1) * TILE_N].astype(
                    jnp.float32)).astype(jnp.bfloat16)
        t = _dot3(scr_h[:], scr_l[:], bwh[0], bwl[0])      # (rh, 128) f32
    else:
        t = _to_f32(blocks[0][0, pl.ds(rs, pp.rh), :])
        if pp.raw_scale is not None:
            t = t * jnp.float32(pp.raw_scale)
    if not pp.has_h:
        return t
    th = t.astype(jnp.bfloat16)
    tl = (t - th.astype(jnp.float32)).astype(jnp.bfloat16)
    return _dot3(th, tl, awh[jr], awl[jr], left=True)       # (128, 128)


def mega3_tail(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               mx_y, mx_c, my_y, my_c, h_out: int, epilogue,
               norm: float | None,
               rt_scalars: jnp.ndarray | None = None) -> jnp.ndarray:
    """Whole fused pipeline in one kernel: raw (luma, chroma, chroma)
    planes -> W resize -> H resize -> epilogue (color matrix + corrections
    + dither) -> (..., 3, h_out, W_out).  ``mx_*``/``my_*``: per-axis
    banded matrices or None (direct slice); ``norm`` folds the UNORM
    normalization into the first matrix touching each raw plane.

    ``rt_scalars``: optional (K,) float32 of per-call runtime parameters
    (serving mode — e.g. the ProcAmp color matrix).  When given, the
    epilogue is called as ``epilogue(y, u, v, rt_ref)`` with an SMEM ref it
    can index, so parameter changes never retrace/recompile — the cbuffer
    re-upload analogue (Source/DX11VideoProcessor.cpp:954-983)."""
    lead = y.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    n_jr = _round_up(h_out, TILE_N) // TILE_N
    out_h_pad = n_jr * TILE_N
    w_out = (mx_y.shape[1] if mx_y is not None else y.shape[-1])
    n_wt = _round_up(w_out, TILE_N) // TILE_N

    py = _MegaPlane(mx_y, my_y, y.shape[-2], y.shape[-1], out_h_pad, norm)
    pc = _MegaPlane(mx_c, my_c, u.shape[-2], u.shape[-1], out_h_pad, norm)

    ycat = py.make_xcat(y.reshape(l, *y.shape[-2:]))
    ucat = pc.make_xcat(u.reshape(l, *u.shape[-2:]))
    vcat = pc.make_xcat(v.reshape(l, *v.shape[-2:]))

    # scalar prefetch: col-window block indices, y blocks then chroma blocks
    sy = py.cs[:n_wt].reshape(-1) if py.has_w else py.cs[:n_wt].reshape(-1)
    sc = pc.cs[:n_wt].reshape(-1) if pc.has_w else pc.cs[:n_wt].reshape(-1)
    scal = np.concatenate([sy, sc]).astype(np.int32)
    y_off = 0
    c_off = len(sy)

    def xspec(pp, base, i):
        return pl.BlockSpec(
            (1, pp.h_pad, TILE_N),
            lambda b, wt, s, _base=base, _i=i, _nb=pp.nb:
                (b, 0, s[_base + wt * _nb + _i]),
            memory_space=pltpu.VMEM)

    in_specs, inputs, scratch = [], [], []
    for i in range(py.nb):
        in_specs.append(xspec(py, y_off, i))
        inputs.append(ycat)
    for i in range(pc.nb):
        in_specs.append(xspec(pc, c_off, i))
        inputs.append(ucat)
    for i in range(pc.nb):
        in_specs.append(xspec(pc, c_off, i))
        inputs.append(vcat)

    wmap = lambda b, wt, s: (wt, 0, 0)
    cmap = lambda b, wt, s: (0, 0, 0)
    for pp in (py, pc):
        if pp.has_w:
            in_specs += [pl.BlockSpec((1, pp.kbw, TILE_N), wmap,
                                      memory_space=pltpu.VMEM)] * 2
            inputs += [jnp.asarray(pp.bwh), jnp.asarray(pp.bwl)]
            scratch += [pltpu.VMEM((pp.rh, pp.kbw), jnp.bfloat16)] * 2
        if pp.has_h:
            in_specs += [pl.BlockSpec((n_jr, TILE_N, pp.rh), cmap,
                                      memory_space=pltpu.VMEM)] * 2
            inputs += [jnp.asarray(pp.awh), jnp.asarray(pp.awl)]

    has_rt = rt_scalars is not None
    if has_rt:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rt_scalars, jnp.float32))

    nby, nbc = py.nb, pc.nb

    def kern(s_ref, *refs):
        i = 0
        yb = refs[i:i + nby]; i += nby
        ub = refs[i:i + nbc]; i += nbc
        vb = refs[i:i + nbc]; i += nbc
        wy = wc = ay = ac = (None, None)
        if py.has_w:
            wy = (refs[i], refs[i + 1]); i += 2
        if py.has_h:
            ay = (refs[i], refs[i + 1]); i += 2
        if pc.has_w:
            wc = (refs[i], refs[i + 1]); i += 2
        if pc.has_h:
            ac = (refs[i], refs[i + 1]); i += 2
        rt_ref = None
        if has_rt:
            rt_ref = refs[i]; i += 1
        o_ref = refs[i]; i += 1
        scr = refs[i:]
        si = 0
        if py.has_w:
            ysh, ysl = scr[si], scr[si + 1]; si += 2
        else:
            ysh = ysl = None
        if pc.has_w:
            csh, csl = scr[si], scr[si + 1]; si += 2
        else:
            csh = csl = None
        for jr in range(n_jr):
            yt = _mega_plane_tile(yb, py, jr, ysh, ysl, *wy, *ay)
            ut = _mega_plane_tile(ub, pc, jr, csh, csl, *wc, *ac)
            vt = _mega_plane_tile(vb, pc, jr, csh, csl, *wc, *ac)
            rgb = (epilogue(yt, ut, vt, rt_ref) if has_rt
                   else epilogue(yt, ut, vt))
            o_ref[0, :, pl.ds(jr * TILE_N, TILE_N), :] = rgb

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(l, n_wt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 3, out_h_pad, TILE_N),
                                   lambda b, wt, s: (b, 0, 0, wt),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((l, 3, out_h_pad, n_wt * TILE_N),
                                       jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(jnp.asarray(scal), *inputs)

    out = out[:, :, :h_out, :w_out]
    return out.reshape(lead + (3, h_out, w_out))


def rows3_tail(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               my_y: np.ndarray | None, my_c: np.ndarray | None,
               h_out: int, epilogue,
               y_scale: float | None = None,
               c_scale: float | None = None,
               rt_scalars: jnp.ndarray | None = None,
               pack_format: str | None = None) -> jnp.ndarray:
    """H-resize the (luma, chroma, chroma) planes, mix and run the tail.

    ``y``: (..., Hy, W); ``u``/``v``: (..., Hc, W) — float32 (W-passed) or
    raw integer planes.  ``my_y`` (Hy, h_out) / ``my_c`` (Hc, h_out): banded
    H matrices, or None when that plane needs no H resize (then Hy/Hc must
    equal h_out and ``y_scale``/``c_scale`` normalize raw integers).
    ``epilogue``: traced fn (y, u, v) each (128, tile_w) f32 ->
    (3, 128, tile_w) f32 — the color matrix + corrections + tone map +
    dither chain.  Returns (..., 3, h_out, W) float32, or with
    ``pack_format`` ("rgb10a2"/"rgba8") an (..., h_out, W) int32 surface
    of packed dwords (see :func:`pack_surface_tiles`).
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
                            jnp.int16.dtype, jnp.float32.dtype):
            p3 = p3.astype(jnp.float32)
        if h_pad != h_in or w_pad != w:
            p3 = jnp.pad(p3, ((0, 0), (0, h_pad - h_in), (0, w_pad - w)))
        return p3

    # VMEM per w-column: the three f32 input stripes + the out block
    # (double-buffered), bf16 hi/lo scratch for planes with H matrices,
    # plus the resident weight bands.  Wider tiles cut grid steps and
    # lengthen the per-row DMA chunk of the column stripes.
    _kept = (jnp.uint8.dtype, jnp.uint16.dtype, jnp.int16.dtype,
             jnp.float32.dtype)
    _isz = lambda p: p.dtype.itemsize if p.dtype in _kept else 4
    io_per_col = hy_pad * _isz(y) + 2 * hc_pad * _isz(u) \
        + (h_out_pad if pack_format is not None else 3 * h_out_pad) * 4
    scr_per_col = (2 * hy_pad * 2 if y_pack is not None else 0) \
        + (4 * hc_pad * 2 if c_pack is not None else 0)
    wb = 0
    if y_pack is not None:
        wb += 2 * y_pack[1].size * 2
    if c_pack is not None:
        wb += 2 * c_pack[1].size * 2
    tile_w = _pick_tile_vmem(io_per_col, scr_per_col, wb,
                             _ROWS3_TILE_W, 128, total=w)
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

    if rt_scalars is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rt_scalars, jnp.float32))

    kernel = _make_rows3_kernel(n_tiles, y_pack is not None,
                                c_pack is not None, epilogue,
                                y_scale, c_scale,
                                has_rt=rt_scalars is not None,
                                pack_format=pack_format)
    if pack_format is not None:
        out_spec = pl.BlockSpec((1, h_out_pad, tile_w),
                                lambda b, wt, s1, s2: (b, 0, wt),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((l, h_out_pad, w_pad), jnp.int32)
    else:
        out_spec = pl.BlockSpec((1, 3, h_out_pad, tile_w),
                                lambda b, wt, s1, s2: (b, 0, 0, wt),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((l, 3, h_out_pad, w_pad),
                                         jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(l, w_pad // tile_w),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
    )(jnp.asarray(sy), jnp.asarray(sc), *inputs)

    if pack_format is not None:
        out = out[:, :h_out, :w]
        return out.reshape(lead + (h_out, w))
    out = out[:, :, :h_out, :w]
    return out.reshape(lead + (3, h_out, w))
