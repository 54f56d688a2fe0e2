#!/usr/bin/env python
"""Per-config benchmark suite — the BASELINE.md configs (and the VERDICT-r2
additions: rotation, SuperRes, packed-surface subtitles), measured on the
real chip and written atomically to BENCH_DETAILS.md.

Per row (VERDICT r2 #2/#3):
 * throughput as the MEDIAN over ``REPEATS`` independently-timed groups of
   ``ITERS`` dispatches, with the observed min-max spread — one run rewrites
   the whole file, no best-seen cherry-picking;
 * PSNR vs the float64 staged-path oracle (bench_oracle.py) on frame 0 of
   the same inputs being timed — hard-fails the run below the 55 dB bar
   (40 dB for the learned-upscaler row: the net is bfloat16 by design, so
   its oracle delta measures model numerics, not HLSL parity).

The driver-facing headline stays in bench.py.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time
import traceback

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

import bench_common as bc
from videorenderer_tpu.pipeline import (_pack_surface_xla, make_deint_fields_fn,
                                        make_frame_fn, make_serving_fn)

WARMUP = 2
ITERS = 3
REPEATS = 5
PSNR_BAR = {"c3sr": 40.0, "c1vh": 40.0}
DEFAULT_BAR = 55.0

# Raw committed evidence: every row (and every failure, WITH its traceback)
# is appended here so a hardware flake can never lose its record — the
# reference never loses a failure either (m_RenderStats.failed,
# Source/DX11VideoProcessor.cpp:2157).
SESSION_LOG = "BENCH_HW_SESSION.jsonl"


def log_record(rec: dict) -> None:
    rec = dict(rec)
    rec.setdefault("_source", "bench_configs")
    rec.setdefault("_ts",
                   datetime.datetime.now().isoformat(timespec="seconds"))
    with open(SESSION_LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _sync(out):
    """True device sync through the remote relay: fetch one element."""
    np.asarray(out.ravel()[0])


def measure(dispatch, frames_per_iter: int) -> list[float]:
    """Median-friendly timing: WARMUP dispatches, then REPEATS groups of
    ITERS dispatches, each group synced and timed independently."""
    n = 0
    for _ in range(WARMUP):
        out = dispatch(n)
        n += 1
    _sync(out)
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = dispatch(n)
            n += 1
        _sync(out)
        samples.append(frames_per_iter * ITERS / (time.perf_counter() - t0))
    return samples


def device_batches(key, dev, seeds=(0, 1)):
    fmt, w, h, batch = bc.input_spec(key)
    return [tuple(jax.device_put(jnp.asarray(p), dev)
                  for p in bc.make_planes(fmt, w, h, batch, seed=s))
            for s in seeds]


def load_ref(key):
    path = os.path.join(bc.REF_DIR, f"{key}.npy")
    return np.load(path) if os.path.exists(path) else None


def _ref_fresh(key) -> bool:
    if load_ref(key) is None:
        return False
    try:
        with open(os.path.join(bc.REF_DIR, f"{key}.spec.json")) as f:
            return json.load(f) == bc.ref_spec(key)
    except (OSError, ValueError):
        return False


def ensure_refs(keys):
    missing = [k for k in keys if not _ref_fresh(k)]
    if not missing:
        return
    print(f"generating float64 references for {missing} (CPU subprocess)...",
          file=sys.stderr)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               JAX_ENABLE_X64="1")
    subprocess.run([sys.executable, "bench_oracle.py", *missing], env=env,
                   check=True)


def run_config(key: str, dev) -> tuple[list[float], float]:
    """Returns (fps samples, psnr_db)."""
    plan = bc.build_plan(key)
    fmt, w, h, batch = bc.input_spec(key)

    if key in ("c5", "c5s"):
        from videorenderer_tpu.runner import DeinterlaceSession
        sess = DeinterlaceSession(plan, double_rate=True, pack_surface=True)
        bs = device_batches(key, dev)
        if key == "c5s":
            from videorenderer_tpu.ops.overlay import blend_in_rect_packed
            rgb, alpha = bc.subtitle_overlay()
            rgb_d = jax.device_put(jnp.asarray(rgb), dev)
            a_d = jax.device_put(jnp.asarray(alpha), dev)
            blend = jax.jit(lambda s: blend_in_rect_packed(
                s, rgb_d, a_d, x=bc.SUB_X, y=bc.SUB_Y, fmt="rgba8"))
        else:
            blend = lambda s: s
        # prime the window + compile
        out = None
        for i in range(2):
            for o in sess.push_batch(bs[i]):
                out = blend(o)
        _sync(out)
        samples = []
        n_call = 0
        for r in range(REPEATS + 1):           # extra first group = warmup
            t0 = time.perf_counter()
            nf = 0
            for _ in range(ITERS):
                for o in sess.push_batch(bs[n_call % 2]):
                    out = blend(o)
                    nf += o.shape[0]
                n_call += 1
            _sync(out)
            if r > 0:
                samples.append(nf / (time.perf_counter() - t0))
        # PSNR: the first emitted field of the stream-start window
        b0 = bs[0]
        f0 = tuple(p[0:1] for p in b0)
        f1 = tuple(p[1:2] for p in b0)
        dfn = jax.jit(make_deint_fields_fn(plan, pack_surface=True))
        field0, _ = dfn(f0, f0, f1)
        got = bc.decode_output(np.asarray(field0)[0], plan)
        if key == "c5s":
            got = bc.decode_output(np.asarray(blend(field0))[0], plan)
        return samples, bc.psnr_db(got, load_ref(key))

    if key in ("c6", "c9"):
        from jax.sharding import Mesh
        from videorenderer_tpu.parallel.spatial import (make_spatial_frame_fn,
                                                        shard_planes_rows)
        mesh = Mesh(np.array(jax.devices()[:1]), ("spatial",))
        fn = jax.jit(make_spatial_frame_fn(plan, mesh,
                                           pack_surface=key == "c6"))
        raw = [tuple(jnp.asarray(p)
                     for p in bc.make_planes(fmt, w, h, batch, seed=s))
               for s in (0, 1)]
        bs = [shard_planes_rows(mesh, b) for b in raw]
        state = {}

        def dispatch(i):
            state["out"] = fn(bs[i % 2])
            return state["out"]

        samples = measure(dispatch, batch)
        got = bc.decode_output(np.asarray(fn(bs[0]))[0], plan)
        return samples, bc.psnr_db(got, load_ref(key))

    if key in ("c7", "c8"):
        fn = jax.jit(make_serving_fn(plan, pack_surface=True))
        bs = device_batches(key, dev)
        rts = ([bc.c7_rt(0), bc.c7_rt(1)] if key == "c7"
               else [{"dovi_curves": bc.dovi_rt(i)} for i in (0, 1)])

        def dispatch(i):
            return fn(bs[i % 2], rts[i % 2])

        samples = measure(dispatch, batch)
        got = bc.decode_output(np.asarray(fn(bs[0], rts[0]))[0], plan)
        return samples, bc.psnr_db(got, load_ref(key))

    # plain frame-fn configs
    if key == "c3rot":
        # rotation rides the resize: the one-pass Jinc2 kernel runs in the
        # rotated geometry (pre-rotated uint8 source planes, transformed
        # maps + dither pattern) and writes the final surface directly —
        # no 4K packed-surface transpose pass (VERDICT r4 #3)
        fn = jax.jit(make_frame_fn(plan, pack_surface=True,
                                   rotation=90, flip=True))
    elif key == "c3sr":
        from videorenderer_tpu.models.superres import enhance_plane_chw
        params, cfg = bc.superres_params()
        params = jax.device_put(params, dev)
        base = make_frame_fn(plan)
        fn = jax.jit(lambda p: _pack_surface_xla(
            enhance_plane_chw(params, base(p), cfg), "rgba8"))
    elif key == "c1vh":
        from videorenderer_tpu.models.videohdr import enhance_plane_chw
        params, cfg = bc.videohdr_params()
        params = jax.device_put(params, dev)
        base = make_frame_fn(plan)
        fn = jax.jit(lambda p: _pack_surface_xla(
            enhance_plane_chw(params, base(p), cfg), "rgb10a2"))
    else:
        fn = jax.jit(make_frame_fn(plan, pack_surface=True))
    bs = device_batches(key, dev)

    def dispatch(i):
        return fn(bs[i % 2])

    samples = measure(dispatch, batch)
    got = bc.decode_output(np.asarray(fn(bs[0]))[0], plan)
    ref = load_ref(key)
    if key in ("c3sr", "c1vh"):
        # the packed output is quantized; quantize the float oracle alike
        maxv = 1023.0 if plan.dst.bits == 10 else 255.0
        ref = np.floor(np.clip(ref, 0.0, 1.0) * maxv + 0.5) / maxv
    return samples, bc.psnr_db(got, ref)


def main() -> None:
    keys = [a for a in sys.argv[1:] if not a.startswith("-")] or bc.ALL_KEYS
    ensure_refs(keys)
    dev = jax.devices()[0]
    rows = []
    failures = []
    for key in keys:
        try:
            samples, psnr = run_config(key, dev)
        except Exception as e:          # one config must not kill the suite
            err = f"{type(e).__name__}: {e}"
            print(json.dumps({"config": bc.NAMES[key], "error": err[:300]}))
            log_record({"key": key, "config": bc.NAMES[key],
                        "error": err, "traceback": traceback.format_exc()})
            failures.append((key, "error", err[:120]))
            rows.append((key, bc.NAMES[key], 0.0, 0.0, 0.0, 0.0, False,
                         err))
            continue
        med = float(np.median(samples))
        lo, hi = float(min(samples)), float(max(samples))
        bar = PSNR_BAR.get(key, DEFAULT_BAR)
        ok = psnr >= bar
        if not ok:
            failures.append((key, psnr, bar))
        rows.append((key, bc.NAMES[key], med, lo, hi, psnr, ok, None))
        rec = {"key": key, "config": bc.NAMES[key],
               "fps_median": round(med, 1), "fps_min": round(lo, 1),
               "fps_max": round(hi, 1), "psnr_db": round(psnr, 2),
               "psnr_ok": ok}
        print(json.dumps({k: v for k, v in rec.items() if k != "key"}))
        log_record(rec)

    lines = ["# BENCH_DETAILS — per-config throughput (TPU v5e, 1 chip)\n"]
    for key, name, med, lo, hi, psnr, ok, err in rows:
        if err is not None:
            # the error row keeps its reason in the table AND the full
            # traceback in BENCH_HW_SESSION.jsonl — never a bare 0.0
            lines.append(f"- {name}: **ERROR** `{err[:160]}` "
                         "(traceback in BENCH_HW_SESSION.jsonl)")
            continue
        flag = "" if ok else "  **FAILED <%g dB**" % PSNR_BAR.get(key,
                                                                  DEFAULT_BAR)
        note = (" (model-numerics bar 40 dB)" if key in ("c3sr", "c1vh")
                else "")
        lines.append(f"- {name}: **{med:.1f} frames/s** "
                     f"(min-max {lo:.1f}-{hi:.1f}) @ **{psnr:.2f} dB**"
                     f"{note}{flag}")
    lines.append(
        f"\nEach row: median of {REPEATS} independently-timed groups of "
        f"{ITERS} dispatches (batch per config), regenerated atomically by "
        "one `bench_configs.py` run; PSNR is frame 0 of the timed inputs vs "
        "the float64 staged-path oracle (`bench_oracle.py`), gated at 55 dB "
        "(40 dB for the learned-model rows, whose nets compute in reduced "
        "precision by design). Inputs are device-"
        "resident: the TPU sits behind a network relay here, so a host-fed "
        "measurement would time the relay, not the framework "
        "(`runner.run_clip` provides the overlapped host feed for real "
        "deployments). The 3r row's PSNR reflects the documented r5 "
        "rank-4 truncation of its 32-phase Jinc2 pass (+10% throughput "
        "for an error floor still above the 8-bit quantization floor; "
        "ops/scale.py `_JINC2_SV_CUTOFF`).")
    if set(keys) == set(bc.ALL_KEYS):
        # only a FULL run may rewrite the table (one atomic source of
        # truth; partial runs print JSON only and never mix into old rows).
        # This writer owns ONLY the table region: every `## ` section
        # (hw_ingest's measured sections, the roofline) is preserved —
        # a full rerun must never destroy other harnesses' records.
        try:
            with open("BENCH_DETAILS.md") as f:
                old = f.read()
        except OSError:
            old = ""
        i = old.find("\n## ")
        tail = old[i + 1:].rstrip() + "\n" if i >= 0 else ""
        tmp = "BENCH_DETAILS.md.tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
            if tail:
                f.write("\n" + tail)
        os.replace(tmp, "BENCH_DETAILS.md")
    if failures:
        print(f"PSNR FAILURES: {failures}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
