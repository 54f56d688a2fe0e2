"""Fused motion-adaptive deinterlace kernels.

The config-5 chain (4K60 interlaced HLG -> SDR fields) previously paid a
full float round-trip before the resize: an XLA pass computed the
motion-adaptive select (two row-shifts + parity mask + |next-prev| ramp,
ops/deinterlace.py) writing f32 planes that the banded W kernels then
re-read.  The fixed-function deinterlacer the reference uses does the
select inside the rate-conversion blt (Source/D3D11VP.cpp:893-960) — these
kernels are its TPU analogue, restructured H-first so the vertical
neighbors the deint needs are VMEM-resident:

 * :func:`deint3_rows_dual` — stage A: per column stripe, the raw integer
   (prev, cur, next) windows of all three planes convert in-kernel, the
   motion ramp is computed ONCE and both temporal fields' deint + banded
   H-resize run from the same loads (double-rate output,
   Source/DX11VideoProcessor.cpp:2176-2197);
 * :func:`cols3_tail` — stage B: the lane-dim twin of
   resize_pallas.rows3_tail: banded W-resize of the three planes + the
   color matrix / corrections / tone-map / dither epilogue + optional
   packed-surface store, per field.

H-then-W is mathematically identical to the fused path's W-then-H
(separable linear maps commute); the tail epilogue is the same traced
closure, so the full chain keeps the kernel-path numerics of the headline
pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resize_pallas import (ROWS_KB_ALIGN, TILE_N, _dot3, _round_up,
                            _split_bf16, _split_stripe, _to_f32, pack_band_for,
                            pack_surface_tiles)


def _shift_up(cf):
    """rows shifted down by one: out[r] = cf[r-1], row 0 duplicated."""
    return jnp.concatenate([cf[:1], cf[:-1]], axis=0)


def _shift_dn(cf):
    """out[r] = cf[r+1], last row duplicated."""
    return jnp.concatenate([cf[1:], cf[-1:]], axis=0)


def _deint_fields(pf, cf, nf, thr, top_field_first: bool, h_real: int):
    """Motion-adaptive deint of a (H_pad, W) stripe for both temporal
    fields — same math as ops.deinterlace.motion_adaptive, shared motion
    ramp.  ``h_real``: the true plane height (rows beyond it are zero pad
    whose values never reach the output — the banded H weights are zero
    there — but the bottom-row clamp must reference the real last row)."""
    alpha = jnp.clip((jnp.abs(nf - pf) - thr) / thr, 0.0, 1.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, cf.shape, 0)
    up = _shift_up(cf)
    dn = _shift_dn(cf)
    outs = []
    for field in (0, 1):
        use_top = (field == 0) == top_field_first
        if use_top:
            # bottom clamp: last odd row averages field row H-2 twice
            u_, d_ = up, jnp.where(rows == h_real - 1, up, dn)
        else:
            # top clamp: row 0 averages field row 1 twice
            u_, d_ = jnp.where(rows == 0, dn, up), dn
        bob = (u_ + d_) * 0.5
        mixed = cf + (bob - cf) * alpha
        parity = (rows & 1) == (1 if use_top else 0)
        outs.append(jnp.where(parity, mixed, cf))
    return outs


def _prep_rows_band(mat: np.ndarray, pre_scale: float | None):
    starts, bands, kb, h_pad = pack_band_for(mat, kb_align=ROWS_KB_ALIGN)
    if pre_scale is not None:
        bands = bands * np.float32(pre_scale)
    bt = np.ascontiguousarray(np.swapaxes(bands, 1, 2))
    w_hi, w_lo = _split_bf16(bt)
    return starts, jnp.asarray(w_hi), jnp.asarray(w_lo), kb, h_pad


def deint3_rows_dual(prev, cur, nxt, my_y: np.ndarray, my_c: np.ndarray,
                     h_out: int, thr: float, top_field_first: bool = True,
                     y_scale: float | None = None,
                     c_scale: float | None = None,
                     keep_pad: bool = False,
                     vmem_limit: int = 100 * 1024 * 1024):
    """Stage A: (prev, cur, next) raw plane triples -> H-resized deint
    planes for BOTH fields.

    ``prev``/``cur``/``nxt``: (y, u, v) tuples, y (..., Hy, Wy) and chroma
    (..., Hc, Wc) uint8/uint16 with Wy == Wc * r (r in {1, 2}).  ``my_y``
    (Hy, h_out) / ``my_c`` (Hc, h_out): banded H maps (normalization folded
    via ``y_scale``/``c_scale``).  ``thr``: motion threshold in raw code
    units.  Returns ((y0, u0, v0), (y1, u1, v1)), each (..., h_out, W*)
    float32 (normalized).
    """
    y, u, v = cur
    lead = y.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    hy, wy = y.shape[-2], y.shape[-1]
    hc, wc = u.shape[-2], u.shape[-1]
    assert wy % wc == 0 and wy // wc in (1, 2), (wy, wc)
    ratio = wy // wc

    n_tiles = _round_up(h_out, TILE_N) // TILE_N
    h_out_pad = n_tiles * TILE_N
    sy, wyh, wyl, kby, hy_pad = _prep_rows_band(my_y, y_scale)
    sc, wch, wcl, kbc, hc_pad = _prep_rows_band(my_c, c_scale)

    tile_wc = 128
    tile_wy = tile_wc * ratio
    wc_pad = _round_up(wc, tile_wc)
    wy_pad = wc_pad * ratio

    def prep(p, h, hp, wp):
        p3 = jnp.asarray(p).reshape(l, h, p.shape[-1])
        if p3.shape[-1] != wp or h != hp:
            p3 = jnp.pad(p3, ((0, 0), (0, hp - h), (0, wp - p3.shape[-1])))
        return p3

    ins = []
    for frames in (prev, cur, nxt):
        ins.append(prep(frames[0], hy, hy_pad, wy_pad))
    for k in (1, 2):
        for frames in (prev, cur, nxt):
            ins.append(prep(frames[k], hc, hc_pad, wc_pad))

    yspec = pl.BlockSpec((1, hy_pad, tile_wy), lambda b, wt, s1, s2: (b, 0, wt),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, hc_pad, tile_wc), lambda b, wt, s1, s2: (b, 0, wt),
                         memory_space=pltpu.VMEM)
    wspec = lambda kb: pl.BlockSpec((n_tiles, TILE_N, kb),
                                    lambda b, wt, s1, s2: (0, 0, 0),
                                    memory_space=pltpu.VMEM)

    thr_f = float(thr)

    def kernel(sy_ref, sc_ref, yp, yc, yn, up_, uc, un, vp, vc, vn,
               wyh_r, wyl_r, wch_r, wcl_r, oy, oc, hi, lo, chi, clo):
        def h_pass(dint, hi_r, lo_r, w_hi, w_lo, s_ref, kb, o_ref, f, ci):
            _split_stripe(dint, hi_r, lo_r)
            for jr in range(n_tiles):
                st = pl.multiple_of(s_ref[jr], ROWS_KB_ALIGN)
                res = _dot3(hi_r[pl.ds(st, kb)], lo_r[pl.ds(st, kb)],
                            w_hi[jr], w_lo[jr], left=True)
                if ci is None:
                    o_ref[0, f, pl.ds(jr * TILE_N, TILE_N), :] = res
                else:
                    o_ref[0, f, ci, pl.ds(jr * TILE_N, TILE_N), :] = res

        d0, d1 = _deint_fields(_to_f32(yp[0]), _to_f32(yc[0]),
                               _to_f32(yn[0]), thr_f, top_field_first, hy)
        h_pass(d0, hi, lo, wyh_r, wyl_r, sy_ref, kby, oy, 0, None)
        h_pass(d1, hi, lo, wyh_r, wyl_r, sy_ref, kby, oy, 1, None)
        for ci, (cp, cc, cn) in enumerate(((up_, uc, un), (vp, vc, vn))):
            e0, e1 = _deint_fields(_to_f32(cp[0]), _to_f32(cc[0]),
                                   _to_f32(cn[0]), thr_f, top_field_first,
                                   hc)
            h_pass(e0, chi, clo, wch_r, wcl_r, sc_ref, kbc, oc, 0, ci)
            h_pass(e1, chi, clo, wch_r, wcl_r, sc_ref, kbc, oc, 1, ci)

    out_y, out_c = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(l, wc_pad // tile_wc),
            in_specs=[yspec] * 3 + [cspec] * 6
            + [wspec(kby)] * 2 + [wspec(kbc)] * 2,
            out_specs=[
                pl.BlockSpec((1, 2, h_out_pad, tile_wy),
                             lambda b, wt, s1, s2: (b, 0, 0, wt),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, 2, h_out_pad, tile_wc),
                             lambda b, wt, s1, s2: (b, 0, 0, 0, wt),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((hy_pad, tile_wy), jnp.bfloat16),
                pltpu.VMEM((hy_pad, tile_wy), jnp.bfloat16),
                pltpu.VMEM((hc_pad, tile_wc), jnp.bfloat16),
                pltpu.VMEM((hc_pad, tile_wc), jnp.bfloat16),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((l, 2, h_out_pad, wy_pad), jnp.float32),
            jax.ShapeDtypeStruct((l, 2, 2, h_out_pad, wc_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(jnp.asarray(sy), jnp.asarray(sc), *ins, wyh, wyl, wch, wcl)

    if keep_pad:
        # hand the (h_out_pad, w_pad) blocks straight to a downstream kernel
        # whose tiling accepts the pad rows (the caller crops its output) —
        # avoids a full-size XLA re-pad copy between the stages
        ho, wyc, wcc = h_out_pad, wy_pad, wc_pad
    else:
        ho, wyc, wcc = h_out, wy, wc

    def cut(a, w):
        return a[..., :ho, :w]

    y0 = cut(out_y[:, 0], wyc).reshape(lead + (ho, wyc))
    y1 = cut(out_y[:, 1], wyc).reshape(lead + (ho, wyc))
    u0 = cut(out_c[:, 0, 0], wcc).reshape(lead + (ho, wcc))
    v0 = cut(out_c[:, 0, 1], wcc).reshape(lead + (ho, wcc))
    u1 = cut(out_c[:, 1, 0], wcc).reshape(lead + (ho, wcc))
    v1 = cut(out_c[:, 1, 1], wcc).reshape(lead + (ho, wcc))
    return (y0, u0, v0), (y1, u1, v1)


def rows3_mid(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
              my_in_y: np.ndarray | None, my_in_c: np.ndarray | None,
              h_mid: int, mid_fn, my_out: np.ndarray | None, h_out: int,
              y_scale: float | None = None, c_scale: float | None = None,
              rt_scalars: jnp.ndarray | None = None,
              vmem_limit: int = 96 * 1024 * 1024):
    """Sandwich kernel: per-plane banded H maps INTO a mid resolution, a
    nonlinear per-pixel stage on the VMEM-resident mid stripes, and a
    shared banded H map OUT — one kernel, no full-size float intermediate.

    Built for the DoVi chain (VERDICT r2 #5): chroma H-upsample to source
    res, reshape + ycc matrix + LMS PQ round-trip (``mid_fn``), then the H
    downscale — the reference does the whole chain in one pass
    (Source/Shaders.cpp:531-859); previously the source-res PQ RGB between
    the split-fused stages cost ~100 MB/frame of HBM traffic at 4K.

    ``y``: (..., Hy, W); ``u``/``v``: (..., Hc, W) float32 or raw ints.
    ``my_in_y`` (Hy, h_mid) / ``my_in_c`` (Hc, h_mid): per-plane in maps
    (None = identity, then H* == h_mid and the scale normalizes raw input).
    ``mid_fn``: traced (y, u, v[, rt_ref]) stripes (h_mid_pad, tile_w) ->
    (3, h_mid_pad, tile_w).  ``my_out`` (h_mid, h_out) or None.
    Returns (..., 3, h_out, W) float32."""
    lead = y.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    w = y.shape[-1]
    assert u.shape[-1] == w and v.shape[-1] == w
    hy, hc = y.shape[-2], u.shape[-2]
    n_out = _round_up(h_out, TILE_N) // TILE_N
    h_out_pad = n_out * TILE_N
    n_mid = _round_up(h_mid, TILE_N) // TILE_N
    h_mid_pad = n_mid * TILE_N

    def prep_in(mat, h_in, pre_scale):
        if mat is None:
            return None, max(_round_up(h_in, ROWS_KB_ALIGN), h_mid_pad)
        # pad the map's output side to h_mid_pad so mid stripes tile evenly
        m = np.zeros((mat.shape[0], h_mid_pad), np.float32)
        m[:, :mat.shape[1]] = mat
        starts, bands, kb, h_pad = pack_band_for(m, kb_align=ROWS_KB_ALIGN)
        if pre_scale is not None:
            bands = bands * np.float32(pre_scale)
        bt = np.ascontiguousarray(np.swapaxes(bands, 1, 2))
        w_hi, w_lo = _split_bf16(bt)
        return (np.asarray(starts, np.int32), jnp.asarray(w_hi),
                jnp.asarray(w_lo), kb), h_pad

    y_in, hy_pad = prep_in(my_in_y, hy, y_scale)
    c_in, hc_pad = prep_in(my_in_c, hc, c_scale)
    if my_in_y is not None:
        y_scale = None
    if my_in_c is not None:
        c_scale = None

    if my_out is not None:
        mo = np.zeros((h_mid_pad, my_out.shape[1]), np.float32)
        mo[:my_out.shape[0]] = my_out
        so, bands_o, kbo, _ = pack_band_for(mo, kb_align=ROWS_KB_ALIGN)
        bto = np.ascontiguousarray(np.swapaxes(bands_o, 1, 2))
        woh, wol = _split_bf16(bto)
        o_pack = (np.asarray(so, np.int32), jnp.asarray(woh),
                  jnp.asarray(wol), kbo)
    else:
        assert h_out <= h_mid_pad
        o_pack = None

    tile_w = 128
    w_pad = _round_up(w, tile_w)

    def prep(p, h_in, h_pad):
        p3 = p.reshape(l, h_in, w)
        if p3.dtype not in (jnp.uint8.dtype, jnp.uint16.dtype,
                            jnp.float32.dtype):
            p3 = p3.astype(jnp.float32)
        if h_pad != h_in or w_pad != w:
            p3 = jnp.pad(p3, ((0, 0), (0, h_pad - h_in), (0, w_pad - w)))
        return p3

    y3, u3, v3 = prep(y, hy, hy_pad), prep(u, hc, hc_pad), prep(v, hc,
                                                                hc_pad)
    imap = lambda b, wt, s1, s2, s3: (b, 0, wt)
    wmap = lambda b, wt, s1, s2, s3: (0, 0, 0)
    in_specs = [
        pl.BlockSpec((1, hy_pad, tile_w), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hc_pad, tile_w), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hc_pad, tile_w), imap, memory_space=pltpu.VMEM),
    ]
    inputs = [y3, u3, v3]
    scratch = [pltpu.VMEM((h_mid_pad, tile_w), jnp.float32)] * 3
    if y_in is not None:
        sy, wyh, wyl, kby = y_in
        in_specs += [pl.BlockSpec((n_mid, TILE_N, kby), wmap,
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [wyh, wyl]
        scratch += [pltpu.VMEM((hy_pad, tile_w), jnp.bfloat16)] * 2
    else:
        sy = np.zeros(n_mid, np.int32)
    if c_in is not None:
        sc, wch, wcl, kbc = c_in
        in_specs += [pl.BlockSpec((n_mid, TILE_N, kbc), wmap,
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [wch, wcl]
        scratch += [pltpu.VMEM((hc_pad, tile_w), jnp.bfloat16)] * 4
    else:
        sc = np.zeros(n_mid, np.int32)
    if o_pack is not None:
        so, woh, wol, kbo = o_pack
        in_specs += [pl.BlockSpec((n_out, TILE_N, kbo), wmap,
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [woh, wol]
        scratch += [pltpu.VMEM((h_mid_pad, tile_w), jnp.bfloat16)] * 2
    else:
        so = np.zeros(n_out, np.int32)
    if rt_scalars is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rt_scalars, jnp.float32))

    has_y, has_c = y_in is not None, c_in is not None
    has_o, has_rt = o_pack is not None, rt_scalars is not None

    def kernel(sy_ref, sc_ref, so_ref, *refs):
        i = 3
        y_ref, u_ref, v_ref = refs[0], refs[1], refs[2]
        if has_y:
            kwyh, kwyl = refs[i], refs[i + 1]
            i += 2
        if has_c:
            kwch, kwcl = refs[i], refs[i + 1]
            i += 2
        if has_o:
            kwoh, kwol = refs[i], refs[i + 1]
            i += 2
        rt_ref = None
        if has_rt:
            rt_ref = refs[i]
            i += 1
        o_ref = refs[i]
        scr = refs[i + 1:]
        ys_m, us_m, vs_m = scr[0], scr[1], scr[2]
        si = 3
        if has_y:
            yhi, ylo = scr[si], scr[si + 1]
            si += 2
            _split_stripe(_to_f32(y_ref[0]), yhi, ylo)
            kby_ = kwyh.shape[2]
            for jr in range(n_mid):
                st = pl.multiple_of(sy_ref[jr], ROWS_KB_ALIGN)
                ys_m[pl.ds(jr * TILE_N, TILE_N), :] = _dot3(
                    yhi[pl.ds(st, kby_)], ylo[pl.ds(st, kby_)],
                    kwyh[jr], kwyl[jr], left=True)
        else:
            yt = _to_f32(y_ref[0, :h_mid_pad, :])
            ys_m[:] = yt * jnp.float32(y_scale) if y_scale is not None else yt
        if has_c:
            chi, clo = scr[si], scr[si + 1]
            c2hi, c2lo = scr[si + 2], scr[si + 3]
            si += 4
            _split_stripe(_to_f32(u_ref[0]), chi, clo)
            _split_stripe(_to_f32(v_ref[0]), c2hi, c2lo)
            kbc_ = kwch.shape[2]
            for jr in range(n_mid):
                st = pl.multiple_of(sc_ref[jr], ROWS_KB_ALIGN)
                us_m[pl.ds(jr * TILE_N, TILE_N), :] = _dot3(
                    chi[pl.ds(st, kbc_)], clo[pl.ds(st, kbc_)],
                    kwch[jr], kwcl[jr], left=True)
                vs_m[pl.ds(jr * TILE_N, TILE_N), :] = _dot3(
                    c2hi[pl.ds(st, kbc_)], c2lo[pl.ds(st, kbc_)],
                    kwch[jr], kwcl[jr], left=True)
        else:
            ut = _to_f32(u_ref[0, :h_mid_pad, :])
            vt = _to_f32(v_ref[0, :h_mid_pad, :])
            if c_scale is not None:
                ut = ut * jnp.float32(c_scale)
                vt = vt * jnp.float32(c_scale)
            us_m[:] = ut
            vs_m[:] = vt

        rgb = (mid_fn(ys_m[:], us_m[:], vs_m[:], rt_ref) if has_rt
               else mid_fn(ys_m[:], us_m[:], vs_m[:]))

        if has_o:
            ohi, olo = scr[si], scr[si + 1]
            kbo_ = kwoh.shape[2]
            for ch in range(3):
                _split_stripe(rgb[ch], ohi, olo)
                for jr in range(n_out):
                    st = pl.multiple_of(so_ref[jr], ROWS_KB_ALIGN)
                    o_ref[0, ch, pl.ds(jr * TILE_N, TILE_N), :] = _dot3(
                        ohi[pl.ds(st, kbo_)], olo[pl.ds(st, kbo_)],
                        kwoh[jr], kwol[jr], left=True)
        else:
            o_ref[0, :, :, :] = rgb[:, :h_out_pad, :]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(l, w_pad // tile_w),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 3, h_out_pad, tile_w),
                                   lambda b, wt, s1, s2, s3: (b, 0, 0, wt),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((l, 3, h_out_pad, w_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(jnp.asarray(sy), jnp.asarray(sc), jnp.asarray(so), *inputs)

    return out[:, :, :h_out, :w].reshape(lead + (3, h_out, w))


def _prep_cols_band(mat: np.ndarray, pre_scale: float | None):
    starts, bands, kb, w_pad = pack_band_for(mat)
    if pre_scale is not None:
        bands = bands * np.float32(pre_scale)
    w_hi, w_lo = _split_bf16(bands)
    return starts, jnp.asarray(w_hi), jnp.asarray(w_lo), kb, w_pad


def cols3_tail(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               mx_y: np.ndarray | None, mx_c: np.ndarray | None,
               w_out: int, epilogue,
               y_scale: float | None = None,
               c_scale: float | None = None,
               rt_scalars: jnp.ndarray | None = None,
               pack_format: str | None = None,
               vmem_limit: int | None = None) -> jnp.ndarray:
    """W-resize the (luma, chroma, chroma) planes, mix and run the tail —
    the lane-dim twin of resize_pallas.rows3_tail for H-first pipelines.

    ``y``: (..., H, Wy); ``u``/``v``: (..., H, Wc) — float32 or raw
    integers.  ``mx_y`` (Wy, w_out) / ``mx_c`` (Wc, w_out): banded W maps,
    or None when that plane needs no W resize (then W* == w_out and the
    scale normalizes raw input).  ``epilogue``: traced (y, u, v) ->
    (3, tile_r, 128) — identical closure contract to rows3_tail (tile
    origins are multiples of 32, so the ordered dither keeps phase).
    """
    lead = y.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    h = y.shape[-2]
    assert u.shape[-2] == h and v.shape[-2] == h
    wyi, wci = y.shape[-1], u.shape[-1]
    n_tiles = _round_up(w_out, TILE_N) // TILE_N
    w_out_pad = n_tiles * TILE_N

    y_pack = c_pack = None
    if mx_y is not None:
        sy, wyh, wyl, kby, wy_pad = _prep_cols_band(mx_y, y_scale)
        y_pack = (wyh, wyl, kby)
        y_scale = None
        # inputs may arrive wider than the map's padded width (an upstream
        # kernel handing over its lane-padded block): the extra cols carry
        # zero band weight either way
        wy_pad = max(wy_pad, _round_up(wyi, TILE_N))
    else:
        wy_pad = max(_round_up(wyi, TILE_N), w_out_pad)
        sy = np.zeros(n_tiles, np.int32)
    if mx_c is not None:
        sc, wch, wcl, kbc, wc_pad = _prep_cols_band(mx_c, c_scale)
        c_pack = (wch, wcl, kbc)
        c_scale = None
        wc_pad = max(wc_pad, _round_up(wci, TILE_N))
    else:
        wc_pad = max(_round_up(wci, TILE_N), w_out_pad)
        sc = np.zeros(n_tiles, np.int32)

    def prep(p, w_in, w_pad):
        p3 = p.reshape(l, h, w_in)
        if p3.dtype not in (jnp.uint8.dtype, jnp.uint16.dtype,
                            jnp.float32.dtype):
            p3 = p3.astype(jnp.float32)
        if w_pad != w_in:
            p3 = jnp.pad(p3, ((0, 0), (0, 0), (0, w_pad - w_in)))
        return p3

    y3, u3, v3 = prep(y, wyi, wy_pad), prep(u, wci, wc_pad), prep(v, wci,
                                                                  wc_pad)
    # rows per stripe: multiple of 32 keeps the Bayer phase; budget VMEM for
    # in blocks + hi/lo scratch + out block + weights
    io_row = (wy_pad * y3.dtype.itemsize + 2 * wc_pad * u3.dtype.itemsize
              + (w_out_pad * 4 if pack_format else 3 * w_out_pad * 4))
    scr_row = 2 * 2 * (wy_pad + 2 * wc_pad)
    wbytes = 0
    if y_pack is not None:
        wbytes += 2 * n_tiles * y_pack[2] * TILE_N * 2
    if c_pack is not None:
        wbytes += 2 * n_tiles * c_pack[2] * TILE_N * 2
    from .resize_pallas import _pick_tile_vmem
    tile_r = _pick_tile_vmem(io_row, scr_row, wbytes, 256, 32, total=h)
    h_pad = _round_up(h, tile_r)
    if h_pad != h:
        pad3 = lambda p: jnp.pad(p, ((0, 0), (0, h_pad - h), (0, 0)))
        y3, u3, v3 = pad3(y3), pad3(u3), pad3(v3)

    imap = lambda b, ht, s1, s2: (b, ht, 0)
    in_specs = [
        pl.BlockSpec((1, tile_r, wy_pad), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_r, wc_pad), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_r, wc_pad), imap, memory_space=pltpu.VMEM),
    ]
    inputs = [y3, u3, v3]
    scratch = []
    wmap = lambda b, ht, s1, s2: (0, 0, 0)
    if y_pack is not None:
        wyh, wyl, kby = y_pack
        in_specs += [pl.BlockSpec((n_tiles, kby, TILE_N), wmap,
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [wyh, wyl]
        scratch += [pltpu.VMEM((tile_r, wy_pad), jnp.bfloat16)] * 2
    if c_pack is not None:
        wch, wcl, kbc = c_pack
        in_specs += [pl.BlockSpec((n_tiles, kbc, TILE_N), wmap,
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [wch, wcl]
        scratch += [pltpu.VMEM((tile_r, wc_pad), jnp.bfloat16)] * 4
    if rt_scalars is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(rt_scalars, jnp.float32))

    has_y, has_c = y_pack is not None, c_pack is not None
    has_rt = rt_scalars is not None

    def kernel(sy_ref, sc_ref, *refs):
        i = 3
        y_ref, u_ref, v_ref = refs[0], refs[1], refs[2]
        if has_y:
            kwyh, kwyl = refs[i], refs[i + 1]
            i += 2
        if has_c:
            kwch, kwcl = refs[i], refs[i + 1]
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
            kby_ = kwyh.shape[1]
        if has_c:
            uhi, ulo, vhi, vlo = scr[si], scr[si + 1], scr[si + 2], scr[si + 3]
            si += 4
            _split_stripe(_to_f32(u_ref[0]), uhi, ulo)
            _split_stripe(_to_f32(v_ref[0]), vhi, vlo)
            kbc_ = kwch.shape[1]

        def dots(j):
            if has_y:
                ys = pl.multiple_of(sy_ref[j], 128)
                yt = _dot3(yhi[:, pl.ds(ys, kby_)], ylo[:, pl.ds(ys, kby_)],
                           kwyh[j], kwyl[j])
            else:
                yt = _to_f32(y_ref[0, :, pl.ds(j * TILE_N, TILE_N)])
                if y_scale is not None:
                    yt = yt * jnp.float32(y_scale)
            if has_c:
                cs_ = pl.multiple_of(sc_ref[j], 128)
                ut = _dot3(uhi[:, pl.ds(cs_, kbc_)], ulo[:, pl.ds(cs_, kbc_)],
                           kwch[j], kwcl[j])
                vt = _dot3(vhi[:, pl.ds(cs_, kbc_)], vlo[:, pl.ds(cs_, kbc_)],
                           kwch[j], kwcl[j])
            else:
                ut = _to_f32(u_ref[0, :, pl.ds(j * TILE_N, TILE_N)])
                vt = _to_f32(v_ref[0, :, pl.ds(j * TILE_N, TILE_N)])
                if c_scale is not None:
                    ut = ut * jnp.float32(c_scale)
                    vt = vt * jnp.float32(c_scale)
            return yt, ut, vt

        cur = dots(0)
        for j in range(n_tiles):
            nxt = dots(j + 1) if j + 1 < n_tiles else None
            yt, ut, vt = cur
            rgb = (epilogue(yt, ut, vt, rt_ref) if has_rt
                   else epilogue(yt, ut, vt))
            if pack_format is not None:
                o_ref[0, :, pl.ds(j * TILE_N, TILE_N)] = \
                    pack_surface_tiles(rgb, pack_format)
            else:
                o_ref[0, :, :, pl.ds(j * TILE_N, TILE_N)] = rgb
            cur = nxt

    if pack_format is not None:
        out_spec = pl.BlockSpec((1, tile_r, w_out_pad),
                                lambda b, ht, s1, s2: (b, ht, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((l, h_pad, w_out_pad), jnp.int32)
    else:
        out_spec = pl.BlockSpec((1, 3, tile_r, w_out_pad),
                                lambda b, ht, s1, s2: (b, 0, ht, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((l, 3, h_pad, w_out_pad),
                                         jnp.float32)

    params = {}
    if vmem_limit is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(l, h_pad // tile_r),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        **params,
    )(jnp.asarray(sy), jnp.asarray(sc), *inputs)

    if pack_format is not None:
        return out[:, :h, :w_out].reshape(lead + (h, w_out))
    return out[:, :, :h, :w_out].reshape(lead + (3, h, w_out))
