"""Experiment: Jinc2 phase-decomposed resample as a fractionally-strided
convolution (lhs_dilation=q, stride=p) vs the stack/reshape phase path.

The polyphase identity: with in/out = p/q reduced, every output row Y = q*i+ry
takes 4 taps x[p*i + cy(ry) + jo - 1] with phase-constant weights; a dilated
conv kernel K[k], k = P + q*(cy(ry)+jo-1) - ry*p, reproduces it exactly and
the conv emits the phases already interleaved — no sublane/lane relayout.

Validates numerics vs ops.scale.jinc2_resize, then times both on the
current backend.  Run under JAX_PLATFORMS=cpu for the numeric check or on
TPU for timing.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import time

import numpy as np
import jax
import jax.numpy as jnp

from videorenderer_tpu.ops import scale as S

EDGE = 4  # edge-replicate padding in input texels (taps reach base-1..base+2)


def _phase_geometry(in_size: int, out_size: int):
    g = math.gcd(in_size, out_size)
    q, p = out_size // g, in_size // g
    base, frac = S._jinc2_tap_data(in_size, out_size)
    cy = base[:q]          # per-phase base offsets (i=0)
    fy = frac[:q]
    return q, p, cy.astype(np.int64), fy


def build_kernel_1d(in_size, out_size):
    """Per-axis tap->dilated-kernel index mapping. Returns (q, p, P, L,
    idx[q,4], fr[q]) where idx[ry,jo] is the kernel position of tap jo of
    phase ry (after EDGE padding shifts the bases)."""
    q, p, cy, fy = _phase_geometry(in_size, out_size)
    cy = cy + EDGE  # input is edge-padded; all bases become >= 0
    # k = P + q*(cy+jo-1) - ry*p ; choose P s.t. k >= 0... we instead choose
    # P = 0 and shift via the conv's negative padding: k0(ry,jo) =
    # q*(cy(ry)+jo-1) - ry*p, all >= 0 given cy >= 1 after EDGE >= 1.
    k = (q * (cy[:, None] + np.arange(4)[None, :] - 1)
         - (np.arange(q) * p)[:, None])
    assert k.min() >= 0, k
    L = int(k.max()) + 1
    return q, p, int(L), k, fy


def jinc2_conv(x, out_h, out_w, dtype=jnp.float32):
    """(..., H, W) -> (..., out_h, out_w), exact jinc2_resize semantics."""
    h, w = x.shape[-2], x.shape[-1]
    qy, py, Ly, ky, fy = build_kernel_1d(h, out_h)
    qx, px, Lx, kx, fx = build_kernel_1d(w, out_w)
    wa = S._JINC2_WINDOW_SINC * np.pi
    wb = S._JINC2_SINC * np.pi

    def resampler(d2):
        d = np.sqrt(d2)
        out = np.where(d2 == 0, wa * wb, np.sin(d * wa) * np.sin(d * wb)
                       / np.where(d2 == 0, 1.0, d2))
        return out

    # 2D kernel: K[kyi, kxi] = w(ry,rx,jo,io)/wsum(ry,rx)
    K = np.zeros((Ly, Lx), np.float32)
    offs = np.arange(4) - 1
    for ry in range(qy):
        d2y = (fy[ry] - offs) ** 2
        for rx in range(qx):
            d2x = (fx[rx] - offs) ** 2
            wgt = resampler(d2y[:, None] + d2x[None, :])
            wgt = wgt / wgt.sum()
            for jo in range(4):
                for io in range(4):
                    K[ky[ry, jo], kx[rx, io]] = wgt[jo, io]
    # conv flips nothing in XLA's conv (it's correlation); tap index k reads
    # xd[Y*p + k - pad_lo]. We built k for pad_lo = 0.
    lead = x.shape[:-2]
    n = int(np.prod(lead)) if lead else 1
    xp = jnp.pad(x.reshape(n, 1, h, w).astype(dtype),
                 [(0, 0), (0, 0), (EDGE, EDGE), (EDGE, EDGE)], mode="edge")
    hd = (h + 2 * EDGE - 1) * qy + 1
    wd = (w + 2 * EDGE - 1) * qx + 1
    # out size with stride p, pad (0, pr): floor((hd + pr - L)/p) + 1 = out_h
    pr_y = (out_h - 1) * py + Ly - hd
    pr_x = (out_w - 1) * px + Lx - wd
    out = jax.lax.conv_general_dilated(
        xp, jnp.asarray(K)[None, None],
        window_strides=(py, px),
        padding=[(0, max(pr_y, 0)), (0, max(pr_x, 0))],
        lhs_dilation=(qy, qx),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    out = out[:, 0, :out_h, :out_w]

    # anti-ringing: clamp against the center 2x2 (taps jo,io in {1,2}),
    # computed with the same strided slices as the phase path
    by, _ = S._jinc2_tap_data(h, out_h)
    bx, _ = S._jinc2_tap_data(w, out_w)
    kh, kw = out_h // qy, out_w // qx
    xpe = jnp.pad(x, [(0, 0)] * (x.ndim - 2)
                  + [(EDGE, EDGE), (EDGE, EDGE)], mode="edge")
    mins, maxs = [], []
    rows_mn, rows_mx = [], []
    for ry in range(qy):
        cyo = int(by[ry]) + EDGE
        cols_mn, cols_mx = [], []
        for rx in range(qx):
            cxo = int(bx[rx]) + EDGE
            taps = [xpe[..., cyo + jo:cyo + jo + py * kh:py,
                        cxo + io:cxo + io + px * kw:px]
                    for jo in (0, 1) for io in (0, 1)]
            mn = jnp.minimum(jnp.minimum(taps[0], taps[1]),
                             jnp.minimum(taps[2], taps[3]))
            mx = jnp.maximum(jnp.maximum(taps[0], taps[1]),
                             jnp.maximum(taps[2], taps[3]))
            cols_mn.append(mn)
            cols_mx.append(mx)
        rows_mn.append(jnp.stack(cols_mn, -1).reshape(cols_mn[0].shape[:-1]
                                                      + (kw * qx,)))
        rows_mx.append(jnp.stack(cols_mx, -1).reshape(cols_mx[0].shape[:-1]
                                                      + (kw * qx,)))
    mn = jnp.swapaxes(jnp.stack(rows_mn, -1), -1, -2)
    mn = mn.reshape(mn.shape[:-3] + (kh * qy, kw * qx))
    mx = jnp.swapaxes(jnp.stack(rows_mx, -1), -1, -2)
    mx = mx.reshape(mx.shape[:-3] + (kh * qy, kw * qx))
    out = out.reshape(lead + (out_h, out_w))
    clamped = jnp.clip(out, mn, mx)
    return out + (clamped - out) * S._JINC2_AR_STRENGTH


def main():
    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    rng = np.random.default_rng(0)

    # numeric check at small size
    x = jnp.asarray(rng.random((3, 36, 48), np.float32))
    ref = np.asarray(jax.jit(lambda a: S.jinc2_resize(a, 72, 96))(x))
    got = np.asarray(jax.jit(lambda a: jinc2_conv(a, 72, 96))(x))
    err = np.abs(got - ref).max()
    print("2x upscale max err vs phase path:", err, flush=True)
    # non-integer rational: 3/2
    ref2 = np.asarray(jax.jit(lambda a: S.jinc2_resize(a, 54, 72))(x))
    got2 = np.asarray(jax.jit(lambda a: jinc2_conv(a, 54, 72))(x))
    err2 = np.abs(got2 - ref2).max()
    print("1.5x max err:", err2, flush=True)
    if backend != "tpu":
        assert err < 2e-5 and err2 < 2e-5
        print("numeric OK")
        return

    # timing: 1080p -> 4K x3 channels, batch 8 (config-3 shape)
    xb = jnp.asarray(rng.random((8, 3, 1080, 1920), np.float32))
    f_phase = jax.jit(lambda a: S.jinc2_resize(a, 2160, 3840))
    f_conv = jax.jit(lambda a: jinc2_conv(a, 2160, 3840))
    for name, f in [("phase", f_phase), ("conv", f_conv)]:
        o = f(xb)
        np.asarray(o[0, 0, :1, :1])
        t0 = time.time()
        for _ in range(8):
            o = f(xb)
        np.asarray(o[0, 0, :1, :1])
        dt = time.time() - t0
        print(f"{name}: {8 * 8 / dt:.1f} frames/s (3ch 1080p->4K)",
              flush=True)


if __name__ == "__main__":
    main()
