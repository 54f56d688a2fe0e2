#!/usr/bin/env python
"""Host-fed real-time sustain test: can the full end-to-end loop hold a
display rate with the quality manager in charge?

The reference's contract is per-frame: render within the frame duration,
drop when late (Source/DX11VideoProcessor.cpp:2176-2197, renbase2.h:46-68).
This harness plays N seconds of a clip at a target rate through
``PresentClock.schedule`` (the renbase2 quality loop) with a depth-2
dispatch queue (the swap-chain presentation model) and reports drops and
sync statistics — the end-to-end "sustains 4K60" verdict.

Two feeds per config:
 * device — frames pre-staged on the chip (isolates the render path; what
   a co-located host with DMA sees);
 * host — jax.device_put per frame inside the loop.  NOTE: this chip sits
   behind a network relay, so the host feed times the tunnel (~24 MB/frame
   at 4K); on co-located hardware the feed rides PCIe.  Reported anyway,
   labeled.

Usage: python bench_realtime.py [--fps 60] [--seconds 5] [keys...]
  (default keys: c1 c4; add c2/c7/c8 freely)
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
from videorenderer_tpu.pipeline import make_frame_fn
from videorenderer_tpu.runner import PresentClock
from videorenderer_tpu.stats import Metrics

DEFAULT_KEYS = ["c1", "c4"]
POOL = 8              # distinct frames cycled through the clip


def _sync(out):
    np.asarray(out.ravel()[0])


def run(key: str, fps: float, seconds: float, dev) -> None:
    plan = bc.build_plan(key)
    fmt, w, h, _ = bc.input_spec(key)
    host_frames = [bc.make_planes(fmt, w, h, 1, seed=s) for s in range(POOL)]
    dev_frames = [tuple(jax.device_put(jnp.asarray(p), dev) for p in f)
                  for f in host_frames]
    fn = jax.jit(make_frame_fn(plan, pack_surface=True))
    _sync(fn(dev_frames[0]))
    n = int(fps * seconds)

    for feed in ("device", "host"):
        metrics = Metrics()
        clock = PresentClock(fps=fps, metrics=metrics)
        prev = None
        rendered = 0
        t0 = time.perf_counter()
        for i in range(n):
            if not clock.schedule(i):
                continue
            clock.quality.on_render_start()
            if feed == "host":
                planes = tuple(jax.device_put(jnp.asarray(p), dev)
                               for p in host_frames[i % POOL])
            else:
                planes = dev_frames[i % POOL]
            cur = fn(planes)            # dispatch frame i
            if prev is not None:
                _sync(prev)             # depth-2: sync frame i-1
            prev = cur
            clock.quality.on_render_end()
            rendered += 1
        if prev is not None:
            _sync(prev)
        wall = time.perf_counter() - t0
        snap = metrics.snapshot()
        print(json.dumps({
            "config": key, "feed": feed, "target_fps": fps,
            "frames": n, "rendered": rendered,
            "dropped": clock.dropped,
            "drop_pct": round(100.0 * clock.dropped / n, 2),
            "wall_s": round(wall, 2),
            "sustained": clock.dropped == 0 and wall <= seconds * 1.02,
            "avg_sync_offset_ms": round(snap["avg_sync_offset_ms"], 3),
            "dev_sync_offset_ms": round(snap["dev_sync_offset_ms"], 3),
        }), flush=True)


def run_deint_double_rate(fps: float, seconds: float, dev,
                          depth: int = 2) -> None:
    """Double-rate deinterlace sustain (VERDICT r4 #7): the c5 chain
    through PresentClock.schedule at a device-fed ``fps`` (120 Hz = the
    8.3 ms/field contract).  Each schedule tick is one FIELD; even ticks
    run the dual-field program for the next source frame (both fields of
    one program — the reference's field-2-at-+duration/2 model,
    Source/DX11VideoProcessor.cpp:2176-2197), odd ticks present the
    already-computed second field.  Device-fed only: the host feed is
    relay-tunnel-bound on this box and stays covered (and labeled) by the
    60/30 Hz rows.

    ``depth`` is the present-confirmation interval: every sync through the
    TPU relay costs the full ~26-30 ms round trip, so confirming EVERY
    present (the reference's depth-2 swap-chain analogue, depth=2 here)
    can never meet an 8.3 ms budget FROM THIS HOST regardless of device
    speed — the documented tunnel floor.  Single-device execution is
    in-order, so syncing every ``depth``-th present retires everything
    dispatched before it at one round trip per ``depth`` fields
    (amortized RTT/depth per field).  Measured at depth 16 after the
    push_batch step was jitted (it previously built the sliding window
    with ~15 EAGER device ops per push — ~26 ms of control-plane round
    trips that capped paced AND burst issue at ~80 fields/s): 120 Hz
    device-fed SUSTAINS with 0 drops and ~2 ms sync offsets.  Both rows
    are published: depth 2 (tunnel-labeled) and the amortizing depth."""
    from videorenderer_tpu.runner import DeinterlaceSession
    plan = bc.build_plan("c5")
    fmt, w, h, _ = bc.input_spec("c5")
    host_frames = [bc.make_planes(fmt, w, h, 1, seed=s) for s in range(POOL)]
    dev_frames = [tuple(jax.device_put(jnp.asarray(p), dev) for p in f)
                  for f in host_frames]
    n = int(fps * seconds)

    sess = DeinterlaceSession(plan, double_rate=True, pack_surface=True)
    pend = []
    for i in range(3):                 # prime the 3-frame window + compile
        pend = sess.push_batch(dev_frames[i % POOL])
    for o in pend:
        _sync(o)

    metrics = Metrics()
    clock = PresentClock(fps=fps, metrics=metrics)
    rendered = 0
    last = None
    fi = 3
    t0 = time.perf_counter()
    for j in range(n):
        if j % 2 == 0:                 # the next sample arrives
            pend = sess.push_batch(dev_frames[fi % POOL])
            fi += 1
        if not clock.schedule(j):
            continue                   # this field's present is dropped
        clock.quality.on_render_start()
        out = pend[j % 2] if len(pend) > j % 2 else None
        if out is not None:
            last = out
            rendered += 1
            if rendered % depth == 0:
                _sync(out)             # retires the depth-1 before it too
        clock.quality.on_render_end()
    if last is not None:
        _sync(last)
    wall = time.perf_counter() - t0
    snap = metrics.snapshot()
    print(json.dumps({
        "config": "c5 double-rate (fields)", "feed": "device",
        "queue_depth": depth,
        "target_fps": fps, "frames": n, "rendered": rendered,
        "dropped": clock.dropped,
        "drop_pct": round(100.0 * clock.dropped / n, 2),
        "wall_s": round(wall, 2),
        "sustained": clock.dropped == 0 and wall <= seconds * 1.02,
        "avg_sync_offset_ms": round(snap["avg_sync_offset_ms"], 3),
        "dev_sync_offset_ms": round(snap["dev_sync_offset_ms"], 3),
    }), flush=True)


def run_deint_rate_capacity(seconds: float, dev, depth: int = 16) -> None:
    """Burst-issue capacity of the c5 double-rate chain: how many FIELDS
    per second the device (plus pipelined issue) actually retires, with
    no pacing in the way.  This is the 8.3 ms/field (120 Hz) contract
    proof: the paced rows time the relay tunnel's per-dispatch round trip
    (~20 ms under paced issue, measured — sleeps between dispatches
    defeat the relay's RPC pipelining), which no co-located host pays.
    Burst issue with a sync every ``depth`` presents amortizes the RTT
    exactly like bench_latency's deep-queue interval measurement."""
    from videorenderer_tpu.runner import DeinterlaceSession
    plan = bc.build_plan("c5")
    fmt, w, h, _ = bc.input_spec("c5")
    host_frames = [bc.make_planes(fmt, w, h, 1, seed=s) for s in range(POOL)]
    dev_frames = [tuple(jax.device_put(jnp.asarray(p), dev) for p in f)
                  for f in host_frames]

    sess = DeinterlaceSession(plan, double_rate=True, pack_surface=True)
    pend = []
    for i in range(3):                 # prime the 3-frame window + compile
        pend = sess.push_batch(dev_frames[i % POOL])
    for o in pend:
        _sync(o)

    n_push = max(int(60.0 * seconds), 60)   # >= ~2x the 120 Hz field count
    fields = 0
    t0 = time.perf_counter()
    for i in range(n_push):
        pend = sess.push_batch(dev_frames[(3 + i) % POOL])
        fields += len(pend)
        if (i + 1) % depth == 0:
            _sync(pend[-1])            # in-order: retires everything prior
    _sync(pend[-1])
    wall = time.perf_counter() - t0
    fps_out = fields / wall
    print(json.dumps({
        "config": "c5 double-rate (fields)", "feed": "device-burst",
        "sync_every": depth, "frames": fields,
        "wall_s": round(wall, 2),
        "fields_per_s": round(fps_out, 1),
        "ms_per_field": round(1000.0 * wall / fields, 3),
        "meets_120hz_contract": fps_out >= 120.0,
    }), flush=True)


def main() -> None:
    argv = sys.argv[1:]

    def arg(name, default, cast=float):
        return cast(argv[argv.index(name) + 1]) if name in argv else default
    fps = arg("--fps", 60.0)
    seconds = arg("--seconds", 5.0)
    keys = [a for a in argv if not a.startswith("-")
            and not a.replace(".", "").isdigit()] or DEFAULT_KEYS
    dev = jax.devices()[0]
    for key in keys:
        if key == "c5deint":
            run_deint_double_rate(arg("--fps", 120.0), seconds, dev,
                                  depth=arg("--depth", 2, int))
        elif key == "c5burst":
            run_deint_rate_capacity(seconds, dev,
                                    depth=arg("--depth", 16, int))
        else:
            run(key, fps, seconds, dev)


if __name__ == "__main__":
    main()
