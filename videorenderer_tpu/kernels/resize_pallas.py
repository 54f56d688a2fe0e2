"""Pallas banded-matmul resize kernel.

The weight matrix of a separable resize (videorenderer_tpu/ops/scale.py) is
*banded*: each output column depends on at most ``taps`` (≈ filter support x
scale) consecutive input columns.  A dense MXU matmul wastes ~(W_in / band)
of its FLOPs on zero blocks — ~7-15x for the 4K chains.  This kernel
computes only the diagonal band:

 * host side: for every 128-column output tile, find the input window
   [start_j, start_j + KB) covering all its taps (KB = max window, padded to
   the 128 lane size) and pack the weight band (J, KB, 128);
 * device side: a Pallas kernel with scalar-prefetched ``starts`` DMAs the
   input window from HBM into VMEM (the window start is data-independent but
   not block-aligned, so a manual async copy is used instead of a BlockSpec)
   and runs a (TILE_R, KB) x (KB, 128) MXU matmul per grid step.

This is the TPU-idiomatic replacement of the reference's per-pixel gather
loops (ps_convolution.hlsl:28-43, the interpolation shaders) for the hot
path; the plain-XLA dense matmul in ops/scale.py stays as the fallback
backend and the golden reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256     # rows per grid step
TILE_N = 128     # output columns per grid step (lane width)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_band_cache: dict = {}


def pack_band_for(mat: np.ndarray, kb_align: int = 128):
    """Per-output-tile input windows; window starts are 128-aligned because
    Mosaic requires HBM slice offsets in the lane dimension to be multiples
    of the tiling."""
    key = (id(mat), mat.shape)
    cached = _band_cache.get(key)
    if cached is not None:
        return cached
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
    kb = _round_up(int(widths.max()), kb_align)
    kb = min(kb, w_in_pad)
    starts = np.minimum(starts, max(w_in_pad - kb, 0)).astype(np.int32)
    bands = np.zeros((j_tiles, kb, TILE_N), np.float32)
    for j in range(j_tiles):
        s = int(starts[j])
        cols = mat[s:s + kb, j * TILE_N:(j + 1) * TILE_N]
        bands[j, :cols.shape[0], :cols.shape[1]] = cols
    out = (starts, bands, kb, w_in_pad)
    _band_cache[key] = out
    return out


def _kernel(starts_ref, x_hbm, w_ref, o_ref, scratch, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    start = pl.multiple_of(starts_ref[j], 128)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * TILE_R, TILE_R), pl.ds(start, scratch.shape[1])],
        scratch, sem)
    cp.start()
    cp.wait()
    # HIGHEST: full-f32 accuracy via multiple bf16 MXU passes — affordable
    # because the contraction is only band-wide (the PSNR bar needs it)
    o_ref[:] = jnp.dot(scratch[:], w_ref[0],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


def banded_resize_last_axis(x: jnp.ndarray, mat: np.ndarray,
                            out_dtype=None) -> jnp.ndarray:
    """Resize along the last axis with the banded Pallas kernel.

    ``x``: (..., W_in) float32; ``mat``: (W_in, W_out) numpy weights.
    Leading dims are flattened into row tiles; rows are padded to TILE_R and
    W_out to TILE_N (then cropped).
    """
    w_in, w_out = mat.shape
    assert x.shape[-1] == w_in
    starts, bands, kb, w_in_pad = pack_band_for(mat)
    j_tiles = bands.shape[0]

    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    rows_pad = _round_up(rows, TILE_R)
    x2 = x.reshape(rows, w_in).astype(jnp.float32)
    if rows_pad != rows or w_in_pad != w_in:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, w_in_pad - w_in)))

    grid = (rows_pad // TILE_R, j_tiles)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
                pl.BlockSpec((1, kb, TILE_N), lambda i, j, s: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_R, TILE_N), lambda i, j, s: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((TILE_R, kb), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, j_tiles * TILE_N),
                                       jnp.float32),
    )(jnp.asarray(starts), x2, jnp.asarray(bands))

    out = out[:rows, :w_out]
    res = out.reshape(lead + (w_out,))
    return res.astype(out_dtype) if out_dtype else res


def banded_resize_axis(x: jnp.ndarray, mat: np.ndarray, axis: int) -> jnp.ndarray:
    """Banded resize along ``axis`` (via transpose for non-last axes)."""
    if axis in (-1, x.ndim - 1):
        return banded_resize_last_axis(x, mat)
    moved = jnp.swapaxes(x, axis, -1)
    out = banded_resize_last_axis(moved, mat)
    return jnp.swapaxes(out, axis, -1)
