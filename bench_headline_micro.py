#!/usr/bin/env python
"""Stage-level microbenchmark of the headline chain (4K P010 -> 1080p
RGB10 packed, Lanczos3 + PQ->Hable->gamut->gamma + dither).

bench_profile.py ablates by *settings* (whole-pipeline variants); this
harness times the actual stage dispatches of the fused path in isolation:

  yW     banded W-pass on the luma plane (2160x3840 u16 -> 2160x1920 f32)
  cW     banded W-pass on both chroma planes (chroma-up (x) composed)
  tail   rows3_tail alone (H pass + cmat + PQ/Hable/gamut/gamma + dither
         + pack) on pre-made W-passed float planes
  tailID rows3_tail with an identity epilogue (cmat only, no transfer
         tower, no dither) -- isolates the VPU tone-map tower cost
  full   the production two-stage chain end to end

Per-frame costs should satisfy  full ~ yW + cW + tail  (stages serialize
through the intermediate planes); tail - tailID is the VPU tower.

One JSON line per stage.  Usage: python bench_headline_micro.py [--batch N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                               SourceDescriptor)
from videorenderer_tpu.config import ChromaScaling, Upscaling
from videorenderer_tpu.csputils import CSP, Levels, Primaries, TRC
from videorenderer_tpu.pipeline import (HDR10Metadata, _make_fused_fn,
                                        _make_tail_epilogue, plan_pipeline)

W, H, OW, OH = 3840, 2160, 1920, 1080


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 1),)])


def timeit(fn, args, iters=8, warmup=2):
    out = fn(*args)
    sync(out)
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def _probe_wpass(y, wx, norm, iters):
    """Decompose the W-pass kernel cost: where do its microseconds go?

      yW      production 3-pass banded kernel (baseline, mid16 out)
      yW1     single bf16 pass (WRONG numerics — times the MXU share:
              if ~3x faster, the kernel is MXU-bound on the band dots)
      yWsplit read + u16->f32 + bf16 hi/lo split + write hi (no dots —
              times the DMA+VPU floor)

    One JSON line per probe."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from videorenderer_tpu.kernels import resize_pallas as rp

    out = {}
    f = jax.jit(lambda p: rp.banded_resize_last_axis(
        p, wx, pre_scale=norm, mid16=True))
    out["yW"] = timeit(f, (y,), iters)

    starts, bands, kb, w_in_pad = rp.pack_band_for(wx)
    bands = bands * np.float32(norm)
    j_tiles = bands.shape[0]
    w_hi = np.ascontiguousarray(bands.astype(jnp.bfloat16))
    rows = y.shape[0] * y.shape[1]
    tile_r = 1024 if rows % 1024 == 0 else 512
    rows_pad = rp._round_up(rows, tile_r)

    def k1(starts_ref, x_ref, whi_ref, o_ref, hi_ref):
        hi_ref[:] = rp._to_f32(x_ref[:]).astype(jnp.bfloat16)
        for j in range(j_tiles):
            s = pl.multiple_of(starts_ref[j], 128)
            o_ref[:, j * 128:(j + 1) * 128] = jnp.dot(
                hi_ref[:, pl.ds(s, kb)], whi_ref[j],
                preferred_element_type=jnp.float32)

    def ksplit(starts_ref, x_ref, whi_ref, o_ref, hi_ref):
        hi_ref[:] = rp._to_f32(x_ref[:]).astype(jnp.bfloat16)
        o_ref[:] = hi_ref[:, :o_ref.shape[1]].astype(jnp.float32)

    def run(p, kern):
        x2 = p.reshape(rows, p.shape[2])
        if rows_pad != rows or w_in_pad != x2.shape[1]:
            x2 = jnp.pad(x2, ((0, rows_pad - rows),
                              (0, w_in_pad - x2.shape[1])))
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rows_pad // tile_r,),
                in_specs=[
                    pl.BlockSpec((tile_r, w_in_pad), lambda i, s: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((j_tiles, kb, 128), lambda i, s: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile_r, j_tiles * 128),
                                       lambda i, s: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((tile_r, w_in_pad), jnp.bfloat16)],
            ),
            out_shape=jax.ShapeDtypeStruct((rows_pad, j_tiles * 128),
                                           jnp.float32),
            compiler_params=rp._COMPILER_PARAMS,
        )(jnp.asarray(starts), x2, jnp.asarray(w_hi))

    out["yW1"] = timeit(jax.jit(lambda p: run(p, k1)), (y,), iters)
    out["yWsplit"] = timeit(jax.jit(lambda p: run(p, ksplit)), (y,), iters)
    B = y.shape[0]
    for name, dt in out.items():
        print(json.dumps({"stage": name, "ms_per_frame":
                          round(dt * 1000 / B, 4),
                          "fps": round(B / dt, 1), "batch": B,
                          "kb": kb, "j_tiles": j_tiles}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--probe-wpass", action="store_true",
                    help="run the W-pass cost-decomposition probes only")
    args = ap.parse_args()
    B = args.batch

    dev = jax.devices()[0]
    src = SourceDescriptor(format=ColorFormat.P010, width=W, height=H,
                           matrix=CSP.BT_2020_NC, levels=Levels.TV,
                           primaries=Primaries.BT_2020, transfer=TRC.PQ,
                           hdr10=HDR10Metadata())
    dst = OutputDescriptor(width=OW, height=OH, bits=10)
    st = Settings(upscaling=Upscaling.LANCZOS3,
                  chroma_scaling=ChromaScaling.BILINEAR,
                  convert_to_sdr=True, use_dither=True)
    plan = plan_pipeline(st, src, dst)

    rng = np.random.default_rng(0)
    y = jax.device_put(
        (rng.integers(64, 941, (B, H, W), dtype=np.uint16) << 6), dev)
    u = jax.device_put(
        (rng.integers(64, 961, (B, H // 2, W // 2), dtype=np.uint16) << 6),
        dev)
    v = jax.device_put(
        (rng.integers(64, 961, (B, H // 2, W // 2), dtype=np.uint16) << 6),
        dev)

    from videorenderer_tpu.kernels import resize_pallas as rp
    from videorenderer_tpu.ops import chroma as chroma_ops
    from videorenderer_tpu.ops import scale as scale_ops
    from videorenderer_tpu.pipeline import _compose

    cx = scale_ops.select_scaler(W, OW, st.upscaling, st.downscaling,
                                 st.interpolate_at_50pct)
    cy = scale_ops.select_scaler(H, OH, st.upscaling, st.downscaling,
                                 st.interpolate_at_50pct)
    wx = np.asarray(scale_ops.build_axis_matrix(cx, W, OW), np.float32)
    wy = np.asarray(scale_ops.build_axis_matrix(cy, H, OH), np.float32)
    ux, uy = chroma_ops.chroma_upsample_matrices(
        W // 2, H // 2, 420, st.chroma_scaling, src.chroma_location)
    cwx = np.asarray(_compose(ux, wx), np.float32)
    cwy = np.asarray(_compose(uy, wy), np.float32)
    norm = 1.0 / 65535.0

    if args.probe_wpass:
        _probe_wpass(y, wx, norm, args.iters)
        return

    res = {}

    # --- stage dispatches ------------------------------------------------
    ywf = jax.jit(lambda p: rp.banded_resize_last_axis(p, wx, pre_scale=norm))
    res["yW"] = timeit(ywf, (y,), args.iters)
    yw = ywf(y)

    cwf = jax.jit(lambda a, b: (rp.banded_resize_last_axis(a, cwx,
                                                           pre_scale=norm),
                                rp.banded_resize_last_axis(b, cwx,
                                                           pre_scale=norm)))
    res["cW"] = timeit(cwf, (u, v), args.iters)
    uw, vw = cwf(u, v)

    epi = _make_tail_epilogue(plan)
    tailf = jax.jit(lambda a, b, c: rp.rows3_tail(
        a, b, c, wy, cwy, OH, epi, pack_format="rgb10a2"))
    res["tail"] = timeit(tailf, (yw, uw, vw), args.iters)

    m = np.asarray(plan.cmat_m, np.float32)
    cc = np.asarray(plan.cmat_c, np.float32)

    def epi_id(yy, uu, vv):
        rgb = jnp.stack([m[i, 0] * yy + m[i, 1] * uu + m[i, 2] * vv + cc[i]
                         for i in range(3)], axis=0)
        return jnp.clip(rgb, 0.0, 1.0)

    tidf = jax.jit(lambda a, b, c: rp.rows3_tail(
        a, b, c, wy, cwy, OH, epi_id, pack_format="rgb10a2"))
    res["tailID"] = timeit(tidf, (yw, uw, vw), args.iters)

    # H-only variant: no pack, raw f32 out (isolates the pack epilogue)
    tnpf = jax.jit(lambda a, b, c: rp.rows3_tail(
        a, b, c, wy, cwy, OH, epi, pack_format=None))
    res["tailNoPack"] = timeit(tnpf, (yw, uw, vw), args.iters)

    # --- full chain -------------------------------------------------------
    fused = _make_fused_fn(plan, pack_format="rgb10a2")
    fullf = jax.jit(lambda *p: fused(p))
    res["full"] = timeit(fullf, (y, u, v), args.iters)

    for name, dt in res.items():
        print(json.dumps({
            "stage": name,
            "ms_per_frame": round(dt * 1000 / B, 4),
            "fps": round(B / dt, 1),
            "batch": B,
        }))
    yw_ms = res["yW"] * 1000 / B
    cw_ms = res["cW"] * 1000 / B
    tl_ms = res["tail"] * 1000 / B
    fl_ms = res["full"] * 1000 / B
    print(json.dumps({
        "summary": "attribution",
        "stages_sum_ms": round(yw_ms + cw_ms + tl_ms, 4),
        "full_ms": round(fl_ms, 4),
        "vpu_tower_ms": round((res["tail"] - res["tailID"]) * 1000 / B, 4),
        "pack_ms": round((res["tail"] - res["tailNoPack"]) * 1000 / B, 4),
    }))


if __name__ == "__main__":
    main()
