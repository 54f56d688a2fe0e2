#!/usr/bin/env python
"""Real-time latency benchmark: per-frame (batch-1) render cost vs the
frame budget.

The reference's only implied performance contract is *real-time playback*:
render one frame in under its duration, twice per frame for double-rate
deinterlacing, drop the second field if late
(Source/DX11VideoProcessor.cpp:2176-2197, Source/renbase2.h:46-68).
BENCH_DETAILS times batch-32/60 dispatches (throughput); this harness
measures the latency story at batch 1 per config:

 * ``latency_ms``  — median dispatch->sync per-frame latency (what a
   present-blocking loop would see; through the remote relay this
   includes the tunnel round trip a local chip does not pay);
 * ``interval_ms`` — median steady-state frame interval with a dispatch
   queue depth of 2 (dispatch frame k, then sync frame k-1) — the
   reference's swap-chain-queue presentation model
   (Source/DX11VideoProcessor.cpp:1494-1500: 1-6 buffered presents),
   i.e. one frame of added latency buys transfer/compute pipelining;
 * ``interval_deep_ms`` — per-frame interval over 32 back-to-back
   batch-1 dispatches with ONE final sync: the relay round trip (which
   dominates both numbers above on this box — a NO-OP dispatch+sync
   measures 25-35 ms, MORE than a full 4K tone-map dispatch+sync, so
   subtracting a measured "floor" is meaningless) amortizes to <1 ms,
   leaving the device-side per-frame cost a co-located host with a deep
   present queue sustains.  ``tunnel_floor_ms`` (min/median of 40 no-op
   dispatch+syncs) is reported as context only;
 * ``realtime_60``/``realtime_120`` — raw depth-2 interval under
   16.67/8.33 ms; ``realtime_60_dev``/``realtime_120_dev`` — the same
   verdicts on the deep-queue interval (the framework property).

Usage: python bench_latency.py [keys...]   (default: c1 c3 c4 c5 c8)
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

import bench_common as bc

N = 30          # timed frames per config
WARMUP = 4
DEFAULT_KEYS = ["c1", "c1vh", "c3", "c3sr", "c4", "c5", "c8"]


def _sync(out):
    np.asarray(out.ravel()[0])


def build_dispatch(key: str, dev):
    """Returns (dispatch(i) -> device array, frames_per_dispatch)."""
    plan = bc.build_plan(key)
    fmt, w, h, _ = bc.input_spec(key)
    # two alternating single-frame inputs so no dispatch can be deduped
    frames = [tuple(jax.device_put(jnp.asarray(p), dev)
                    for p in bc.make_planes(fmt, w, h, 1, seed=s))
              for s in (0, 1)]
    if key == "c5":
        from videorenderer_tpu.pipeline import make_deint_fields_fn
        fn = jax.jit(make_deint_fields_fn(plan, pack_surface=True))
        # one dispatch = both fields of frame cur (2 presented frames)
        return (lambda i: fn(frames[i % 2], frames[(i + 1) % 2],
                             frames[i % 2])[1]), 2
    if key == "c8":
        from videorenderer_tpu.pipeline import make_serving_fn
        fn = jax.jit(make_serving_fn(plan, pack_surface=True))
        rts = [{"dovi_curves": bc.dovi_rt(i)} for i in (0, 1)]
        return (lambda i: fn(frames[i % 2], rts[i % 2])), 1
    if key in ("c3sr", "c1vh"):
        # learned-model rows: net applies after the 1:1 base pipeline,
        # pack via XLA (same structure bench_configs times)
        from bench_configs import _pack_surface_xla
        from videorenderer_tpu.pipeline import make_frame_fn
        if key == "c3sr":
            from videorenderer_tpu.models.superres import enhance_plane_chw
            params, cfg = bc.superres_params()
            pack = "rgba8"
        else:
            from videorenderer_tpu.models.videohdr import enhance_plane_chw
            params, cfg = bc.videohdr_params()
            pack = "rgb10a2"
        params = jax.device_put(params, dev)
        base = make_frame_fn(plan)
        fn = jax.jit(lambda p: _pack_surface_xla(
            enhance_plane_chw(params, base(p), cfg), pack))
        return (lambda i: fn(frames[i % 2])), 1
    from videorenderer_tpu.pipeline import make_frame_fn
    fn = jax.jit(make_frame_fn(plan, pack_surface=True))
    return (lambda i: fn(frames[i % 2])), 1


def tunnel_floor(dev) -> tuple[float, float]:
    """(min, median) ms of a no-op dispatch+sync — context for reading
    the raw latency numbers.  NOT subtracted from anything: the relay's
    scheduling makes a no-op cost MORE than a real 4K dispatch at times
    (observed 29.6 ms no-op min vs 25.8 ms full tone-map), so the
    deep-queue interval below is the honest device-cost estimator."""
    x = jax.device_put(np.zeros((8, 128), np.float32), dev)
    f = jax.jit(lambda a: a + 1.0)
    _sync(f(x))
    ts = []
    for _ in range(40):
        t0 = time.perf_counter()
        _sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.min(ts)), float(np.median(ts))


DEEP = 32       # dispatches per deep-queue timing group


def run_config(key: str, dev, floor_ms: float = 0.0) -> dict:
    dispatch, fpd = build_dispatch(key, dev)
    for i in range(WARMUP):
        out = dispatch(i)
    _sync(out)

    # blocking per-frame latency
    lat = []
    for i in range(N):
        t0 = time.perf_counter()
        _sync(dispatch(i))
        lat.append((time.perf_counter() - t0) * 1e3 / fpd)

    # depth-2 pipelined interval: dispatch k, sync k-1
    prev = dispatch(0)
    intervals = []
    t_last = time.perf_counter()
    for i in range(1, N + 1):
        cur = dispatch(i)
        _sync(prev)
        now = time.perf_counter()
        intervals.append((now - t_last) * 1e3 / fpd)
        t_last = now
        prev = cur
    _sync(prev)

    # deep-queue interval: DEEP dispatches, one sync — the relay RTT
    # amortizes to RTT/DEEP (<1 ms), leaving per-frame device cost
    deeps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(DEEP):
            out = dispatch(i)
        _sync(out)
        deeps.append((time.perf_counter() - t0) * 1e3 / (DEEP * fpd))
    med_deep = float(np.median(deeps))

    med_lat = float(np.median(lat))
    med_int = float(np.median(intervals))
    return {"config": bc.NAMES[key],
            "latency_ms": round(med_lat, 3),
            "latency_minmax_ms": [round(min(lat), 3), round(max(lat), 3)],
            "interval_ms": round(med_int, 3),
            "interval_deep_ms": round(med_deep, 3),
            "deep_queue": DEEP,
            "realtime_60": med_int < 1000.0 / 60.0,
            "realtime_120": med_int < 1000.0 / 120.0,
            "realtime_60_dev": med_deep < 1000.0 / 60.0,
            "realtime_120_dev": med_deep < 1000.0 / 120.0}


def main() -> None:
    keys = [a for a in sys.argv[1:] if not a.startswith("-")] or DEFAULT_KEYS
    dev = jax.devices()[0]
    floor, floor_med = tunnel_floor(dev)
    print(json.dumps({"tunnel_floor_ms": round(floor, 3),
                      "tunnel_floor_median_ms": round(floor_med, 3),
                      "note": "no-op dispatch+sync through the relay — "
                              "context only (see interval_deep_ms)"}),
          flush=True)
    for key in keys:
        print(json.dumps(run_config(key, dev)), flush=True)


if __name__ == "__main__":
    main()
