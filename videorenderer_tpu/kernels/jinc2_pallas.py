"""One-pass 2D Jinc2 resample as a single Pallas kernel.

The low-rank expansion (ops/scale.py::_jinc2_lowrank) turns the
non-separable Jinc2 into ~5 separable resizes plus a separable
normalization and a separable anti-ringing bound.  Running those as
individual XLA/banded-kernel passes loses to memory traffic: five
full-size rank intermediates, their sum, the normalization field and the
anti-ringing gathers add up to ~3 GB/frame at 4K — the measured 114 f/s.

This kernel computes EVERYTHING for one (128-row x 128-col) output tile
while its inputs are in VMEM:

 * per rank k: a W dot against the tile's input-column window and an
   H dot against its input-row window (split-bf16 3-pass, as the banded
   resize kernels), accumulated over k;
 * the weight-sum normalization from per-axis rank vectors (an outer
   product per tile — wsum(y,x) = sum_k ay_k(y) * bx_k(x));
 * the anti-ringing clamp: min/max over the center 2x2 taps, computed by
   EXACT 0/1 selection matmuls (selection is linear; sel@hi + sel@lo
   reconstructs f32 exactly) — column-select first, elementwise min/max,
   then row-select;
 * optionally the caller's per-channel epilogue (e.g. dither).

Input column windows must sit at 128-aligned offsets for the streaming
BlockSpecs; window starts are arbitrary, so the input is laid out as a few
lane-shifted copies (shifts in {0,32,64,96}) and each tile picks the copy
that puts its window within `ceil/128` blocks — the scalar-prefetched
block index does the rest.  Per frame the only HBM traffic is the
(shift-replicated) source and the final output.

HBM layout/traffic: frames/s measured on the 1080p->4K config: 114 (XLA
lowrank) -> see BENCH_DETAILS (this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resize_pallas import _dot3, _round_up, _to_f32

TILE = 128
_AR_STRENGTH = 0.8


def _align_down(x: int, m: int) -> int:
    return x // m * m


def _tile_windows(base: np.ndarray, n_out: int, in_size: int,
                  tile: int = TILE):
    """Per-output-tile input windows [lo, hi) covering taps
    clip(base + {-1..2}) of that tile's outputs."""
    n_t = _round_up(n_out, tile) // tile
    los, his = [], []
    for t in range(n_t):
        seg = base[t * tile: min((t + 1) * tile, n_out)]
        los.append(max(int(seg.min()) - 1, 0))
        his.append(min(int(seg.max()) + 2, in_size - 1) + 1)
    return los, his


@functools.cache
def _pack(in_h: int, out_h: int, in_w: int, out_w: int):
    """Host-side packing of every constant the kernel needs."""
    from ..ops import scale as S

    ay_mats, bx_mats, ay, bx = S.jinc2_lr_matrices(in_h, out_h, in_w, out_w)
    by, _ = S._jinc2_tap_data(in_h, out_h)
    bxi, _ = S._jinc2_tap_data(in_w, out_w)
    r = len(ay_mats)

    n_jr = _round_up(out_h, TILE) // TILE
    n_wt = _round_up(out_w, TILE) // TILE
    h_pad = _round_up(in_h, 16)
    out_h_pad = n_jr * TILE

    # --- row windows (sublane slices of the full-height stripe) ------------
    rlo, rhi = _tile_windows(by, out_h, in_h)
    rs = [min(_align_down(lo, 16), max(h_pad - 16, 0)) for lo in rlo]
    rh = _round_up(max(h - s for h, s in zip(rhi, rs)), 16)
    rh = min(rh, h_pad)
    rs = [min(s, h_pad - rh) for s in rs]

    # --- column windows (lane-shifted 128-blocks) ---------------------------
    clo, chi = _tile_windows(bxi, out_w, in_w)
    w_pad = _round_up(in_w, TILE)
    shifts_used: list[int] = []
    shift_of, bstart, loc0 = [], [], []
    for lo, hi in zip(clo, chi):
        sig = (lo % TILE) - (lo % 32)          # in {0,32,64,96}
        if sig not in shifts_used:
            shifts_used.append(sig)
        b = (lo - sig) // TILE * TILE          # aligned start in shifted copy
        shift_of.append(sig)
        bstart.append(b)
        loc0.append(lo - (b + sig))            # = lo % 32, < 32
    kbw = _round_up(max(h - l + l0 for h, l, l0 in
                        zip(chi, clo, loc0)), TILE)
    nb = kbw // TILE
    shifts_used.sort()
    sidx = {s: i for i, s in enumerate(shifts_used)}
    w_blocks = w_pad // TILE
    # block index into xcat (lane dim = len(shifts)*w_pad) per (tile, sub-block)
    cs = np.zeros((n_wt, nb), np.int32)
    for t in range(n_wt):
        base_block = sidx[shift_of[t]] * w_blocks + bstart[t] // TILE
        for i in range(nb):
            cs[t, i] = min(base_block + i,
                           len(shifts_used) * w_blocks - 1)

    # --- weight packs --------------------------------------------------------
    def split(a):
        import ml_dtypes
        hi = a.astype(ml_dtypes.bfloat16)
        lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return hi, lo

    # packs are concatenated so the kernel runs FEW WIDE dots (the first
    # formulation ran 42 small dots per tile and measured ~30% MXU):
    #   bw:   [B_1 | ... | B_r] lane-concat            (kbw, r*TILE)
    #   aw:   [A_1 ... A_r] lane-concat of transposes  (TILE, r*rh)
    #   cw:   [C_bx | C_bx+1] lane-concat               (kbw, 2*TILE)
    #   sw:   [S_by ; S_by+1] sublane-stack             (2*TILE, rh)
    bw = np.zeros((n_wt, kbw, (r + 2) * TILE), np.float32)
    bxt = np.ones((n_wt, r, TILE), np.float32)
    for t in range(n_wt):
        o0 = t * TILE
        o1 = min(o0 + TILE, out_w)
        src0 = bstart[t] + shift_of[t]         # x column of window local 0
        for k in range(r):
            blk = bx_mats[k][src0:src0 + kbw, o0:o1]
            bw[t, :blk.shape[0], k * TILE:k * TILE + o1 - o0] = blk
        bxt[t, :, :o1 - o0] = bx[o0:o1].T
        for j in range(o1 - o0):
            cc0 = int(np.clip(bxi[o0 + j], 0, in_w - 1)) - src0
            cc1 = int(np.clip(bxi[o0 + j] + 1, 0, in_w - 1)) - src0
            bw[t, cc0, r * TILE + j] = 1.0
            bw[t, cc1, (r + 1) * TILE + j] = 1.0
    bwh, bwl = split(bw)

    aw = np.zeros((n_jr, TILE, r * rh), np.float32)
    sw = np.zeros((n_jr, 2 * TILE, rh), np.float32)
    ayt = np.ones((n_jr, TILE, r), np.float32)
    for t in range(n_jr):
        o0 = t * TILE
        o1 = min(o0 + TILE, out_h)
        for k in range(r):
            blk = ay_mats[k][rs[t]:rs[t] + rh, o0:o1]
            aw[t, :o1 - o0, k * rh:k * rh + blk.shape[0]] = blk.T
        ayt[t, :o1 - o0] = ay[o0:o1]
        for j in range(o1 - o0):
            rr0 = int(np.clip(by[o0 + j], 0, in_h - 1)) - rs[t]
            rr1 = int(np.clip(by[o0 + j] + 1, 0, in_h - 1)) - rs[t]
            sw[t, j, rr0] = 1.0
            sw[t, TILE + j, rr1] = 1.0
    awh, awl = split(aw)
    swh, _ = split(sw)

    return dict(r=r, nb=nb, kbw=kbw, rh=rh, rs=tuple(rs), n_jr=n_jr,
                n_wt=n_wt, h_pad=h_pad, w_pad=w_pad, out_h_pad=out_h_pad,
                shifts=tuple(shifts_used), cs=cs, bwh=bwh, bwl=bwl,
                awh=awh, awl=awl, sw=swh, ayt=ayt, bxt=bxt)


def _sel(m, hi, lo, left=False):
    """Exact f32 selection product with a 0/1 bf16 matrix."""
    kw = dict(preferred_element_type=jnp.float32)
    if left:
        return jnp.dot(m, hi, **kw) + jnp.dot(m, lo, **kw)
    return jnp.dot(hi, m, **kw) + jnp.dot(lo, m, **kw)


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _make_kernel(p, epilogue):
    n_jr, r, nb, rh = p["n_jr"], p["r"], p["nb"], p["rh"]
    rs = p["rs"]

    def kern(cs_ref, *refs):
        xs = refs[:nb]
        (bh, bl, ah, al, sw, ayt, bxt, o_ref) = refs[nb:nb + 8]
        xhi, xlo, tsh, tsl = refs[nb + 8:]
        for i in range(nb):
            xf = xs[i][0]
            h, l = _bf16_split(xf)
            xhi[:, i * TILE:(i + 1) * TILE] = h
            xlo[:, i * TILE:(i + 1) * TILE] = l

        def wdot(jr):
            # one wide dot: every rank's W pass AND both anti-ringing
            # column selections (selection columns have zero lo-weights,
            # so the 3-pass product is exact for them: hi*C + lo*C)
            xh = xhi[rs[jr]:rs[jr] + rh]
            xl = xlo[rs[jr]:rs[jr] + rh]
            return _dot3(xh, xl, bh[0], bl[0])           # (rh, (r+2)*128)

        t = wdot(0)
        for jr in range(n_jr):
            # software pipelining: issue the NEXT tile's W dot before this
            # tile's dependent restack/H/AR chain so the MXU has
            # independent work while the VPU runs
            t_next = wdot(jr + 1) if jr + 1 < n_jr else None
            th, tl = _bf16_split(t)
            for k in range(r):
                tsh[k * rh:(k + 1) * rh, :] = th[:, k * TILE:(k + 1) * TILE]
                tsl[k * rh:(k + 1) * rh, :] = tl[:, k * TILE:(k + 1) * TILE]
            un = _dot3(tsh[:], tsl[:], ah[jr], al[jr], left=True)  # (128,128)
            ws = None
            for k in range(r):
                w = ayt[jr][:, k:k + 1] * bxt[0, k:k + 1, :]
                ws = w if ws is None else ws + w
            out = un / ws
            # anti-ringing bounds: min/max the two column selections, then
            # BOTH row selections of mnc|mxc in one dot
            xc0 = t[:, r * TILE:(r + 1) * TILE]
            xc1 = t[:, (r + 1) * TILE:(r + 2) * TILE]
            mnc = jnp.minimum(xc0, xc1)
            mxc = jnp.maximum(xc0, xc1)
            mh, ml = _bf16_split(jnp.concatenate([mnc, mxc], axis=-1))
            sm = _sel(sw[jr], mh, ml, left=True)         # (2*128, 2*128)
            mn = jnp.minimum(sm[:TILE, :TILE], sm[TILE:, :TILE])
            mx = jnp.maximum(sm[:TILE, TILE:], sm[TILE:, TILE:])
            clamped = jnp.clip(out, mn, mx)
            res = out + (clamped - out) * jnp.float32(_AR_STRENGTH)
            if epilogue is not None:
                res = epilogue(res)
            o_ref[0, pl.ds(jr * TILE, TILE), :] = res
            t = t_next

    return kern


def jinc2_resize_fused(x: jnp.ndarray, out_h: int, out_w: int,
                       epilogue=None) -> jnp.ndarray:
    """(..., H, W) float32 -> (..., out_h, out_w): the full 2D Jinc2 with
    anti-ringing in one kernel.  ``epilogue``: optional per-channel traced
    fn on (128, 128) output tiles (tile origins are multiples of 128 in
    both axes, so ordered dither needs no phase offset)."""
    p = _pack(x.shape[-2], out_h, x.shape[-1], out_w)
    lead = x.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    in_h, in_w = x.shape[-2], x.shape[-1]
    x3 = x.reshape(l, in_h, in_w).astype(jnp.float32)
    if p["h_pad"] != in_h or p["w_pad"] != in_w:
        x3 = jnp.pad(x3, ((0, 0), (0, p["h_pad"] - in_h),
                          (0, p["w_pad"] - in_w)))
    parts = []
    for sig in p["shifts"]:
        if sig == 0:
            parts.append(x3)
        else:
            parts.append(jnp.pad(x3[:, :, sig:], ((0, 0), (0, 0), (0, sig))))
    xcat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)

    nb, kbw, rh = p["nb"], p["kbw"], p["rh"]
    n_jr, n_wt, r = p["n_jr"], p["n_wt"], p["r"]
    h_pad, out_h_pad = p["h_pad"], p["out_h_pad"]

    def xmap(i):
        return lambda b, wt, cs: (b, 0, cs[wt * nb + i])

    wmap3 = lambda b, wt, cs: (wt, 0, 0)
    cmap = lambda b, wt, cs: (0, 0, 0)

    in_specs = [pl.BlockSpec((1, h_pad, TILE), xmap(i),
                             memory_space=pltpu.VMEM) for i in range(nb)]
    in_specs += [
        pl.BlockSpec((1, kbw, (r + 2) * TILE), wmap3,
                     memory_space=pltpu.VMEM),                              # bwh
        pl.BlockSpec((1, kbw, (r + 2) * TILE), wmap3,
                     memory_space=pltpu.VMEM),                              # bwl
        pl.BlockSpec((n_jr, TILE, r * rh), cmap, memory_space=pltpu.VMEM),  # awh
        pl.BlockSpec((n_jr, TILE, r * rh), cmap, memory_space=pltpu.VMEM),  # awl
        pl.BlockSpec((n_jr, 2 * TILE, rh), cmap, memory_space=pltpu.VMEM),  # sw
        pl.BlockSpec((n_jr, TILE, r), cmap, memory_space=pltpu.VMEM),       # ayt
        pl.BlockSpec((1, r, TILE), wmap3, memory_space=pltpu.VMEM),         # bxt
    ]
    inputs = [xcat] * nb + [jnp.asarray(p[k]) for k in
                            ("bwh", "bwl", "awh", "awl", "sw",
                             "ayt", "bxt")]

    out = pl.pallas_call(
        _make_kernel(p, epilogue),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(l, n_wt),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, out_h_pad, TILE),
                                   lambda b, wt, cs: (b, 0, wt),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((h_pad, kbw), jnp.bfloat16)] * 2
            + [pltpu.VMEM((r * rh, TILE), jnp.bfloat16)] * 2,
        ),
        out_shape=jax.ShapeDtypeStruct((l, out_h_pad, n_wt * TILE),
                                       jnp.float32),
    )(jnp.asarray(p["cs"].reshape(-1)), *inputs)

    out = out[:, :out_h, :out_w]
    return out.reshape(lead + (out_h, out_w))


# ---------------------------------------------------------------------------
# 3-plane convert+Jinc2 kernel: raw integer YUV planes -> dithered RGB tiles
# ---------------------------------------------------------------------------
#
# The whole staged tail of a Jinc2 upscale chain — chroma upsample, color
# matrix, 2D Jinc2 with anti-ringing, dither — is linear up to the AR clamp,
# and the clamp operates on RGB *tap values*, which are themselves linear in
# the source planes.  So everything folds into per-plane banded matrices:
#
#   resample(U') = sum_k (uy @ Ay_k)^T U (ux @ Bx_k)          (chroma)
#   tap(U', r, c) = uy[:, r]^T U ux[:, c]                     (selections)
#
# and the color matrix + 4-tap min/max + clamp + dither run per output tile
# in VMEM.  Per frame the chip reads the (shift-replicated) integer planes
# and writes the final dithered RGB — no convert intermediate exists at all.
# The reference runs this as convert pass + one-pass Jinc2 shader
# (Shaders/examples/resizer_onepass_jinc2.hlsl); here it is ONE kernel.


def _win_from_mats(mats, sel_lo, sel_hi, n_out, src_size):
    """Per-output [lo, hi) source windows covering every rank matrix's
    nonzeros and the selection vectors' support."""
    lo = np.full(n_out, src_size, np.int64)
    hi = np.zeros(n_out, np.int64)
    for m in mats:
        nz = m[:, :n_out] != 0.0
        any_nz = nz.any(axis=0)
        first = np.argmax(nz, axis=0)
        last = src_size - 1 - np.argmax(nz[::-1], axis=0)
        lo = np.where(any_nz, np.minimum(lo, first), lo)
        hi = np.where(any_nz, np.maximum(hi, last + 1), hi)
    lo = np.minimum(lo, sel_lo)
    hi = np.maximum(hi, sel_hi)
    return lo, hi


def _sel_support(comp, centers, src_size):
    """[lo, hi) support of the selection vector for each output: the
    upsample column's nonzeros (composed case) or the tap itself."""
    if comp is None:
        c = np.clip(centers, 0, src_size - 1)
        return c, c + 1
    nz = comp != 0.0                     # (src, full)
    first = np.argmax(nz, axis=0)
    last = comp.shape[0] - 1 - np.argmax(nz[::-1], axis=0)
    c = np.clip(centers, 0, comp.shape[1] - 1)
    return first[c], last[c] + 1


_PACK3_CACHE: dict = {}


def _pack_plane(in_h: int, out_h: int, in_w: int, out_w: int,
                comp_y: np.ndarray | None = None,
                comp_x: np.ndarray | None = None,
                scale: float | None = None):
    """Memoizing wrapper: a pack costs ~1-2 s (SVDs + dense rank-matrix
    builds at 4K) and runs for both the VMEM-fits probe and the kernel
    trace; key on content fingerprints of the compose matrices."""
    import hashlib

    def fp(a):
        if a is None:
            return None
        return (a.shape, hashlib.md5(np.ascontiguousarray(a)).hexdigest())

    key = (in_h, out_h, in_w, out_w, fp(comp_y), fp(comp_x), scale)
    hit = _PACK3_CACHE.get(key)
    if hit is not None:
        return hit
    out = _pack_plane_impl(in_h, out_h, in_w, out_w, comp_y, comp_x, scale)
    if len(_PACK3_CACHE) >= 8:
        _PACK3_CACHE.pop(next(iter(_PACK3_CACHE)))
    _PACK3_CACHE[key] = out
    return out


def _pack_plane_impl(in_h: int, out_h: int, in_w: int, out_w: int,
                     comp_y: np.ndarray | None = None,
                     comp_x: np.ndarray | None = None,
                     scale: float | None = None):
    """Generalized `_pack`: optional upsample composition (chroma planes)
    and UNORM normalization folded into the W weights (integer input)."""
    from ..ops import scale as S

    ay_mats, bx_mats, ay, bx = S.jinc2_lr_matrices(in_h, out_h, in_w, out_w)
    by, _ = S._jinc2_tap_data(in_h, out_h)
    bxi, _ = S._jinc2_tap_data(in_w, out_w)
    r = len(ay_mats)

    if comp_y is not None:
        ay_mats = [np.ascontiguousarray(comp_y.astype(np.float64) @ m,
                                        np.float32) for m in ay_mats]
    src_h = comp_y.shape[0] if comp_y is not None else in_h
    if comp_x is not None:
        bx_mats = [np.ascontiguousarray(comp_x.astype(np.float64) @ m,
                                        np.float32) for m in bx_mats]
    src_w = comp_x.shape[0] if comp_x is not None else in_w

    n_jr = _round_up(out_h, TILE) // TILE
    n_wt = _round_up(out_w, TILE) // TILE
    h_pad = _round_up(src_h, 16)
    out_h_pad = n_jr * TILE

    r0 = np.clip(by, 0, in_h - 1)
    r1 = np.clip(by + 1, 0, in_h - 1)
    c0 = np.clip(bxi, 0, in_w - 1)
    c1 = np.clip(bxi + 1, 0, in_w - 1)
    sr_lo0, sr_hi0 = _sel_support(comp_y, r0, src_h)
    sr_lo1, sr_hi1 = _sel_support(comp_y, r1, src_h)
    sc_lo0, sc_hi0 = _sel_support(comp_x, c0, src_w)
    sc_lo1, sc_hi1 = _sel_support(comp_x, c1, src_w)

    # --- row windows -------------------------------------------------------
    rlo_a, rhi_a = _win_from_mats(ay_mats, np.minimum(sr_lo0, sr_lo1),
                                  np.maximum(sr_hi0, sr_hi1), out_h, src_h)
    rlo = [int(rlo_a[t * TILE: min((t + 1) * TILE, out_h)].min())
           for t in range(n_jr)]
    rhi = [int(rhi_a[t * TILE: min((t + 1) * TILE, out_h)].max())
           for t in range(n_jr)]
    rs = [min(_align_down(lo, 16), max(h_pad - 16, 0)) for lo in rlo]
    rh = _round_up(max(h - s for h, s in zip(rhi, rs)), 16)
    rh = min(rh, h_pad)
    rs = [min(s, h_pad - rh) for s in rs]

    # --- column windows ----------------------------------------------------
    clo_a, chi_a = _win_from_mats(bx_mats, np.minimum(sc_lo0, sc_lo1),
                                  np.maximum(sc_hi0, sc_hi1), out_w, src_w)
    clo = [int(clo_a[t * TILE: min((t + 1) * TILE, out_w)].min())
           for t in range(n_wt)]
    chi = [int(chi_a[t * TILE: min((t + 1) * TILE, out_w)].max())
           for t in range(n_wt)]
    w_pad = _round_up(src_w, TILE)
    # shift-copy alignment granularity: 8 keeps the in-block band offset
    # (loc0) <= 7, so near-unity W ratios (e.g. the rotation configs'
    # 1.125x pass, band span ~117+7=124) stay within ONE 128 block
    # (kbw=128) instead of straddling two (kbw=256 = 2x the W-pass MACs).
    # Only the shifts actually used materialize as input copies, and copy
    # traffic (~MBs) is noise next to the halved matmul; isotropic 2x
    # geometries have offset 0 and are untouched.
    shifts_used: list[int] = []
    shift_of, bstart, loc0 = [], [], []
    for lo, hi in zip(clo, chi):
        sig = (lo % TILE) - (lo % 8)
        if sig not in shifts_used:
            shifts_used.append(sig)
        b = (lo - sig) // TILE * TILE
        shift_of.append(sig)
        bstart.append(b)
        loc0.append(lo - (b + sig))
    kbw = _round_up(max(h - l + l0 for h, l, l0 in
                        zip(chi, clo, loc0)), TILE)
    nb = kbw // TILE
    shifts_used.sort()
    sidx = {s: i for i, s in enumerate(shifts_used)}
    w_blocks = w_pad // TILE
    cs = np.zeros((n_wt, nb), np.int32)
    for t in range(n_wt):
        base_block = sidx[shift_of[t]] * w_blocks + bstart[t] // TILE
        for i in range(nb):
            cs[t, i] = min(base_block + i,
                           len(shifts_used) * w_blocks - 1)

    def split(a):
        import ml_dtypes
        hi = a.astype(ml_dtypes.bfloat16)
        lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return hi, lo

    # --- W weights: ranks + both column selections -------------------------
    bw = np.zeros((n_wt, kbw, (r + 2) * TILE), np.float32)
    bxt = np.ones((n_wt, r, TILE), np.float32)
    for t in range(n_wt):
        o0 = t * TILE
        o1 = min(o0 + TILE, out_w)
        srcc = bstart[t] + shift_of[t]
        for k in range(r):
            blk = bx_mats[k][srcc:srcc + kbw, o0:o1]
            bw[t, :blk.shape[0], k * TILE:k * TILE + o1 - o0] = blk
        bxt[t, :, :o1 - o0] = bx[o0:o1].T
        for j in range(o1 - o0):
            if comp_x is None:
                bw[t, c0[o0 + j] - srcc, r * TILE + j] = 1.0
                bw[t, c1[o0 + j] - srcc, (r + 1) * TILE + j] = 1.0
            else:
                v0 = comp_x[srcc:srcc + kbw, c0[o0 + j]]
                v1 = comp_x[srcc:srcc + kbw, c1[o0 + j]]
                bw[t, :v0.shape[0], r * TILE + j] = v0
                bw[t, :v1.shape[0], (r + 1) * TILE + j] = v1
    if scale is not None:
        bw *= np.float32(scale)
    bwh, bwl = split(bw)

    # --- H weights: rank transposes + both row selections ------------------
    aw = np.zeros((n_jr, TILE, r * rh), np.float32)
    sw = np.zeros((n_jr, 2 * TILE, rh), np.float32)
    ayt = np.ones((n_jr, TILE, r), np.float32)
    for t in range(n_jr):
        o0 = t * TILE
        o1 = min(o0 + TILE, out_h)
        for k in range(r):
            blk = ay_mats[k][rs[t]:rs[t] + rh, o0:o1]
            aw[t, :o1 - o0, k * rh:k * rh + blk.shape[0]] = blk.T
        ayt[t, :o1 - o0] = ay[o0:o1]
        for j in range(o1 - o0):
            if comp_y is None:
                sw[t, j, r0[o0 + j] - rs[t]] = 1.0
                sw[t, TILE + j, r1[o0 + j] - rs[t]] = 1.0
            else:
                v0 = comp_y[rs[t]:rs[t] + rh, r0[o0 + j]]
                v1 = comp_y[rs[t]:rs[t] + rh, r1[o0 + j]]
                sw[t, j, :v0.shape[0]] = v0
                sw[t, TILE + j, :v1.shape[0]] = v1
    awh, awl = split(aw)
    swh, swl = split(sw)

    return dict(r=r, nb=nb, kbw=kbw, rh=rh, rs=tuple(rs), n_jr=n_jr,
                n_wt=n_wt, h_pad=h_pad, w_pad=w_pad, out_h_pad=out_h_pad,
                shifts=tuple(shifts_used), cs=cs, bwh=bwh, bwl=bwl,
                awh=awh, awl=awl, swh=swh, swl=swl, ayt=ayt, bxt=bxt)


def _make_kernel3(py, pc, cmat_m, cmat_c, epilogue,
                  pack_format: str | None = None,
                  out_transpose: bool = False):
    n_jr, r = py["n_jr"], py["r"]
    nb_y, nb_c = py["nb"], pc["nb"]
    rh_y, rh_c = py["rh"], pc["rh"]
    rs_y, rs_c = py["rs"], pc["rs"]
    m = [[float(cmat_m[i, j]) for j in range(3)] for i in range(3)]
    cv = [float(x) for x in cmat_c]

    def kern(cs_ref, *refs):
        i = 0
        xs_y = refs[i:i + nb_y]; i += nb_y
        xs_u = refs[i:i + nb_c]; i += nb_c
        xs_v = refs[i:i + nb_c]; i += nb_c
        (bhy, bly, ahy, aly, shy, sly, ayt, bxt) = refs[i:i + 8]; i += 8
        (bhc, blc, ahc, alc, shc, slc) = refs[i:i + 6]; i += 6
        o_ref = refs[i]
        (yhi, ylo, uhi, ulo, vhi, vlo,
         tshy, tsly, tshc, tslc) = refs[i + 1:]

        for k in range(nb_y):
            h, l = _bf16_split(_to_f32(xs_y[k][0]))
            yhi[:, k * TILE:(k + 1) * TILE] = h
            ylo[:, k * TILE:(k + 1) * TILE] = l
        for k in range(nb_c):
            h, l = _bf16_split(_to_f32(xs_u[k][0]))
            uhi[:, k * TILE:(k + 1) * TILE] = h
            ulo[:, k * TILE:(k + 1) * TILE] = l
            h, l = _bf16_split(_to_f32(xs_v[k][0]))
            vhi[:, k * TILE:(k + 1) * TILE] = h
            vlo[:, k * TILE:(k + 1) * TILE] = l

        def wdots(jr):
            sy, sc = rs_y[jr], rs_c[jr]
            ty = _dot3(yhi[sy:sy + rh_y], ylo[sy:sy + rh_y], bhy[0], bly[0])
            tu = _dot3(uhi[sc:sc + rh_c], ulo[sc:sc + rh_c], bhc[0], blc[0])
            tv = _dot3(vhi[sc:sc + rh_c], vlo[sc:sc + rh_c], bhc[0], blc[0])
            return ty, tu, tv

        def hpass(jr, t, tsh, tsl, ah, al, rh):
            th, tl = _bf16_split(t)
            for k in range(r):
                tsh[k * rh:(k + 1) * rh, :] = th[:, k * TILE:(k + 1) * TILE]
                tsl[k * rh:(k + 1) * rh, :] = tl[:, k * TILE:(k + 1) * TILE]
            return _dot3(tsh[:], tsl[:], ah[jr], al[jr], left=True)

        def taps(jr, t, sh, sl):
            # both row selections of both AR column selections in one dot:
            # (2T, rh) x (rh, 2T) -> tap (row i, col j) tiles
            xc = t[:, r * TILE:(r + 2) * TILE]
            xh, xl = _bf16_split(xc)
            sm = _dot3(xh, xl, sh[jr], sl[jr], left=True)
            return (sm[:TILE, :TILE], sm[:TILE, TILE:],
                    sm[TILE:, :TILE], sm[TILE:, TILE:])

        # Cross-tile software pipelining is FORBIDDEN in this kernel: both
        # attempted forms MISCOMPILE on real TPUs (corrupt row tiles,
        # ~25 dB PSNR; interpret mode exact — a Mosaic scheduling hazard,
        # not kernel math).  History, so nobody re-attempts it cheaply:
        #  * r3: wdots(jr+1) issued early with the three (rh, (r+2)*128)
        #    W-dot results live across the loop boundary as SSA values —
        #    corrupt tiles, max err 0.58;
        #  * r4: the "Mosaic-safe" variant staging the next tile's W dots
        #    through explicit double-buffered VMEM scratch — bit-exact in
        #    interpret mode AND in unit tests, still ~25.6 dB corrupt on
        #    the hardware bench gate (BENCH_HW_SESSION.jsonl, step 3).
        # The single-plane _make_kernel's SSA pipelining (above) is fine —
        # the hazard is specific to this kernel's liveness pattern.
        # PROFILING ONLY (reads at trace time): VRT_J2_ABLATE=noar,nonorm
        # skips kernel stages to attribute cost on hardware — output is
        # WRONG with any flag set (the bench PSNR gates catch misuse).
        # Measured r5 @1080p->4K: AR taps+clamp are ~37% of the whole
        # kernel (591->950 f/s portrait, 648->978 landscape); the
        # normalization and dither are ~2-3% each.
        import os as _os
        _ablate = set(filter(None,
                             _os.environ.get("VRT_J2_ABLATE", "").split(",")))
        for jr in range(n_jr):
            ty, tu, tv = wdots(jr)
            un_y = hpass(jr, ty, tshy, tsly, ahy, aly, rh_y)
            un_u = hpass(jr, tu, tshc, tslc, ahc, alc, rh_c)
            un_v = hpass(jr, tv, tshc, tslc, ahc, alc, rh_c)
            if "nonorm" in _ablate:
                yn, un, vn = un_y, un_u, un_v
            else:
                ws = None
                for k in range(r):
                    w = ayt[jr][:, k:k + 1] * bxt[0, k:k + 1, :]
                    ws = w if ws is None else ws + w
                inv = 1.0 / ws
                yn, un, vn = un_y * inv, un_u * inv, un_v * inv
            if "noar" not in _ablate:
                ty4 = taps(jr, ty, shy, sly)
                tu4 = taps(jr, tu, shc, slc)
                tv4 = taps(jr, tv, shc, slc)
            outs = []
            for ch in range(3):
                m0, m1, m2, cc = m[ch][0], m[ch][1], m[ch][2], cv[ch]
                rgb = m0 * yn + m1 * un + m2 * vn + cc
                if "noar" in _ablate:
                    outs.append(rgb)
                    continue
                # AR on RGB: convert each of the 4 taps, then bound
                t4 = [m0 * ty4[i] + m1 * tu4[i] + m2 * tv4[i] + cc
                      for i in range(4)]
                mn = jnp.minimum(jnp.minimum(t4[0], t4[1]),
                                 jnp.minimum(t4[2], t4[3]))
                mx = jnp.maximum(jnp.maximum(t4[0], t4[1]),
                                 jnp.maximum(t4[2], t4[3]))
                clamped = jnp.clip(rgb, mn, mx)
                outs.append(rgb + (clamped - rgb) * jnp.float32(_AR_STRENGTH))
            res = jnp.stack(outs, axis=0)
            if epilogue is not None:
                res = epilogue(res)
            if pack_format is not None:
                from .resize_pallas import pack_surface_tiles
                packed = pack_surface_tiles(res, pack_format)
                if out_transpose:
                    # rotation rides the store: the (TILE, TILE) packed
                    # tile transposes in-register and lands at the
                    # transposed position — the compute above is untouched
                    # (bit-identical to the unrotated kernel)
                    o_ref[0, :, pl.ds(jr * TILE, TILE)] = \
                        jnp.swapaxes(packed, 0, 1)
                else:
                    o_ref[0, pl.ds(jr * TILE, TILE), :] = packed
            elif out_transpose:
                o_ref[0, :, :, pl.ds(jr * TILE, TILE)] = \
                    jnp.swapaxes(res, 1, 2)
            else:
                o_ref[0, :, pl.ds(jr * TILE, TILE), :] = res

    return kern


def _vmem3_bytes(py, pc) -> int:
    """Rough scoped-VMEM footprint of the 3-plane kernel: streamed blocks
    double-buffered, resident weights single-buffered, bf16 scratch."""
    r = py["r"]
    # hi/lo bf16 stripe scratch (y, u, v)
    stripes = 4 * (py["h_pad"] * py["kbw"] + 2 * pc["h_pad"] * pc["kbw"])
    weights = 0
    for p in (py, pc):
        weights += 8 * p["kbw"] * (r + 2) * TILE       # bw hi+lo, dbuf
        weights += 4 * p["n_jr"] * TILE * r * p["rh"]  # aw hi+lo, resident
        weights += 4 * p["n_jr"] * 2 * TILE * p["rh"]  # sw hi+lo, resident
    weights += 4 * py["n_jr"] * TILE * r + 8 * r * TILE       # ayt + bxt
    xblocks = 2 * py["h_pad"] * TILE * py["nb"] \
        + 4 * pc["h_pad"] * TILE * pc["nb"]            # u8-ish, dbuf
    scratch = 4 * TILE * r * (py["rh"] + pc["rh"])     # restacks
    out = 2 * 4 * 3 * py["out_h_pad"] * TILE           # f32, dbuf
    return stripes + weights + xblocks + scratch + out


_VMEM3_LIMIT = 56 << 20   # the kernel requests a raised scoped-vmem limit
                          # (v5e has 128 MB VMEM; the 16 MB default is a
                          # compiler conservatism, not hardware)


def jinc2_convert_fits(in_h: int, out_h: int, in_w: int, out_w: int,
                       comp_y, comp_x, y_scale: float | None = None,
                       c_scale: float | None = None,
                       limit: int = _VMEM3_LIMIT) -> bool:
    """Pass the same scales the fused call will use so the probe's packs
    hit the memo cache at trace time instead of packing twice."""
    py = _pack_plane(in_h, out_h, in_w, out_w, scale=y_scale)
    pc = _pack_plane(in_h, out_h, in_w, out_w, comp_y=comp_y, comp_x=comp_x,
                     scale=c_scale)
    return _vmem3_bytes(py, pc) <= limit


def jinc2_convert_fused(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                        comp_y, comp_x, cmat_m, cmat_c,
                        out_h: int, out_w: int,
                        y_scale: float, c_scale: float,
                        epilogue=None,
                        pack_format: str | None = None,
                        out_transpose: bool = False) -> jnp.ndarray:
    """Raw integer (..., H, W) luma + (..., ch, cw) chroma planes ->
    (..., 3, out_h, out_w) float32: chroma upsample + color matrix + 2D
    Jinc2 + anti-ringing (+ epilogue, e.g. dither) in ONE kernel.

    ``out_transpose`` emits the TRANSPOSED result (..., out_w, out_h)
    directly: each output tile transposes in-register at the store and the
    output index map swaps — the rotation-90+flip path with zero extra HBM
    passes (the reference rides rotation inside the resize,
    Source/DX11VideoProcessor.cpp:3115-3199).  The COMPUTE is untouched:
    bit-identical to transposing the unrotated kernel's output.

    Cross-tile software pipelining was removed after failing the hardware
    PSNR gate twice (see the hazard note in _make_kernel3)."""
    lead = y.shape[:-2]
    l = int(np.prod(lead)) if lead else 1
    in_h, in_w = y.shape[-2], y.shape[-1]
    py = _pack_plane(in_h, out_h, in_w, out_w, scale=y_scale)
    pc = _pack_plane(in_h, out_h, in_w, out_w, comp_y=comp_y, comp_x=comp_x,
                     scale=c_scale)

    def xcat_of(p, pack):
        sh, sw_real = p.shape[-2], p.shape[-1]
        x3 = p.reshape(l, sh, sw_real)
        if x3.dtype not in (jnp.uint8.dtype, jnp.uint16.dtype,
                            jnp.float32.dtype):
            x3 = x3.astype(jnp.float32)
        if pack["h_pad"] != sh or pack["w_pad"] != sw_real:
            x3 = jnp.pad(x3, ((0, 0), (0, pack["h_pad"] - sh),
                              (0, pack["w_pad"] - sw_real)))
        parts = []
        for sig in pack["shifts"]:
            if sig == 0:
                parts.append(x3)
            else:
                parts.append(jnp.pad(x3[:, :, sig:],
                                     ((0, 0), (0, 0), (0, sig))))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=-1)

    ycat = xcat_of(y, py)
    ucat = xcat_of(u, pc)
    vcat = xcat_of(v, pc)

    nb_y, nb_c = py["nb"], pc["nb"]
    n_jr, n_wt, r = py["n_jr"], py["n_wt"], py["r"]
    out_h_pad = py["out_h_pad"]
    NY = n_wt * nb_y

    def ymap(i):
        return lambda b, wt, cs: (b, 0, cs[wt * nb_y + i])

    def cmap_x(i):
        return lambda b, wt, cs: (b, 0, cs[NY + wt * nb_c + i])

    wmap = lambda b, wt, cs: (wt, 0, 0)
    kmap = lambda b, wt, cs: (0, 0, 0)

    in_specs = [pl.BlockSpec((1, py["h_pad"], TILE), ymap(i),
                             memory_space=pltpu.VMEM) for i in range(nb_y)]
    in_specs += [pl.BlockSpec((1, pc["h_pad"], TILE), cmap_x(i),
                              memory_space=pltpu.VMEM)
                 for i in range(nb_c)] * 2
    inputs = [ycat] * nb_y + [ucat] * nb_c + [vcat] * nb_c

    def wspecs(pack, with_norm):
        sp = [
            pl.BlockSpec((1, pack["kbw"], (r + 2) * TILE), wmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack["kbw"], (r + 2) * TILE), wmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_jr, TILE, r * pack["rh"]), kmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_jr, TILE, r * pack["rh"]), kmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_jr, 2 * TILE, pack["rh"]), kmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_jr, 2 * TILE, pack["rh"]), kmap,
                         memory_space=pltpu.VMEM),
        ]
        ins = [jnp.asarray(pack[k]) for k in
               ("bwh", "bwl", "awh", "awl", "swh", "swl")]
        if with_norm:
            sp += [pl.BlockSpec((n_jr, TILE, r), kmap,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, r, TILE), wmap,
                                memory_space=pltpu.VMEM)]
            ins += [jnp.asarray(pack["ayt"]), jnp.asarray(pack["bxt"])]
        return sp, ins

    spy, iny = wspecs(py, True)
    spc, inc = wspecs(pc, False)
    in_specs += spy + spc
    inputs += iny + inc

    cs_all = np.concatenate([py["cs"].reshape(-1), pc["cs"].reshape(-1)])

    if pack_format is not None and out_transpose:
        out_spec = pl.BlockSpec((1, TILE, out_h_pad),
                                lambda b, wt, cs: (b, wt, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((l, n_wt * TILE, out_h_pad),
                                       jnp.int32)
    elif pack_format is not None:
        out_spec = pl.BlockSpec((1, out_h_pad, TILE),
                                lambda b, wt, cs: (b, 0, wt),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((l, out_h_pad, n_wt * TILE),
                                       jnp.int32)
    elif out_transpose:
        out_spec = pl.BlockSpec((1, 3, TILE, out_h_pad),
                                lambda b, wt, cs: (b, 0, wt, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((l, 3, n_wt * TILE, out_h_pad),
                                       jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, 3, out_h_pad, TILE),
                                lambda b, wt, cs: (b, 0, 0, wt),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((l, 3, out_h_pad, n_wt * TILE),
                                       jnp.float32)
    scratch = [pltpu.VMEM((py["h_pad"], py["kbw"]), jnp.bfloat16)] * 2 \
        + [pltpu.VMEM((pc["h_pad"], pc["kbw"]), jnp.bfloat16)] * 4 \
        + [pltpu.VMEM((r * py["rh"], TILE), jnp.bfloat16)] * 2 \
        + [pltpu.VMEM((r * pc["rh"], TILE), jnp.bfloat16)] * 2
    out = pl.pallas_call(
        _make_kernel3(py, pc, np.asarray(cmat_m, np.float32),
                      np.asarray(cmat_c, np.float32), epilogue,
                      pack_format=pack_format, out_transpose=out_transpose),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(l, n_wt),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM3_LIMIT + (8 << 20)),
    )(jnp.asarray(cs_all), *inputs)

    if pack_format is not None and out_transpose:
        out = out[:, :out_w, :out_h]
        return out.reshape(lead + (out_w, out_h))
    if pack_format is not None:
        out = out[:, :out_h, :out_w]
        return out.reshape(lead + (out_h, out_w))
    if out_transpose:
        out = out[:, :, :out_w, :out_h]
        return out.reshape(lead + (3, out_w, out_h))
    out = out[:, :, :out_h, :out_w]
    return out.reshape(lead + (3, out_h, out_w))
