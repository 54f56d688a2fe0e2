#!/usr/bin/env python
"""Headline-chain ablation profile: where do the microseconds go?

The remote relay makes XLA device traces unreliable, so this measures by
ablation instead: each variant drops one stage of the headline chain
(4K P010 -> 1080p RGB10, Lanczos3 + PQ->SDR + dither, packed surface) and
the pairwise deltas attribute per-frame cost to resize / tone-map tail /
dither+pack.  One JSON line per variant plus a delta summary.

Usage: python bench_profile.py [--batch N] [--iters N]
"""

from __future__ import annotations

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
from videorenderer_tpu.pipeline import (HDR10Metadata, make_frame_fn,
                                        plan_pipeline)

W, H, OW, OH = 3840, 2160, 1920, 1080


def _src():
    return SourceDescriptor(format=ColorFormat.P010, width=W, height=H,
                            matrix=CSP.BT_2020_NC, levels=Levels.TV,
                            primaries=Primaries.BT_2020, transfer=TRC.PQ,
                            hdr10=HDR10Metadata())


def variants():
    """name -> (Settings, OutputDescriptor). Deltas vs 'full' isolate:
    dither (full - no_dither), SDR tail (full - no_sdr), resize
    (no_sdr - same chain at 1:1 ... approximated by the 4K-out variant's
    extra output traffic; reported raw, interpret with care)."""
    base = dict(upscaling=Upscaling.LANCZOS3,
                chroma_scaling=ChromaScaling.BILINEAR)
    out = OutputDescriptor(width=OW, height=OH, bits=10)
    return {
        "full": (Settings(convert_to_sdr=True, use_dither=True, **base), out),
        "no_dither": (Settings(convert_to_sdr=True, use_dither=False, **base),
                      out),
        "no_sdr": (Settings(convert_to_sdr=False, use_dither=True, **base),
                   out),
        "convert_only_1to1": (
            Settings(convert_to_sdr=True, use_dither=True, **base),
            OutputDescriptor(width=W, height=H, bits=10)),
    }


def main() -> None:
    def arg(name, default):
        return (int(sys.argv[sys.argv.index(name) + 1])
                if name in sys.argv else default)
    batch = arg("--batch", 32)
    iters = arg("--iters", 4)
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    planes = (rng.integers(64, 941, (batch, H, W), np.uint16) << 6,
              rng.integers(64, 961, (batch, H // 2, W // 2), np.uint16) << 6,
              rng.integers(64, 961, (batch, H // 2, W // 2), np.uint16) << 6)
    bs = [tuple(jax.device_put(jnp.asarray(p), dev) for p in planes)
          for _ in range(2)]

    ms = {}
    for name, (st, out_desc) in variants().items():
        plan = plan_pipeline(st, _src(), out_desc)
        fn = jax.jit(make_frame_fn(plan, pack_surface=True))
        o = fn(bs[0])
        np.asarray(o.ravel()[0])
        for _ in range(2):
            o = fn(bs[0])
        np.asarray(o.ravel()[0])
        t0 = time.perf_counter()
        for i in range(iters):
            o = fn(bs[i % 2])
        np.asarray(o.ravel()[0])
        per_frame = (time.perf_counter() - t0) / (iters * batch) * 1e3
        ms[name] = per_frame
        print(json.dumps({"variant": name, "ms_per_frame": round(per_frame, 4),
                          "fps": round(1e3 / per_frame, 1)}), flush=True)

    print(json.dumps({
        "delta_dither_ms": round(ms["full"] - ms["no_dither"], 4),
        "delta_sdr_tail_ms": round(ms["full"] - ms["no_sdr"], 4),
        "note": "convert_only_1to1 writes 4x the output pixels; it bounds "
                "the convert+pack cost, not a clean resize delta",
    }))


if __name__ == "__main__":
    main()
