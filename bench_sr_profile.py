"""SuperRes per-stage profile: where do c3sr's milliseconds go?

VERDICT r3 #7: row 3s (80.9 f/s at 4K-out) is the only bench row far below
real-time 4K60, with no evidence the s2d conv domain exhausted the MXU.
This harness attributes the per-frame cost:

 * full c3sr chain (pipeline 1:1 + net 2x + pack) — the bench row;
 * enhance_plane_chw alone (includes the NCHW<->NHWC moveaxis pair — the
   output transpose relayouts a (B, 2160, 3840, 3) f32 tensor);
 * apply_fn alone (NHWC in/out, no transposes);
 * conv stack only (head+body+tail in the s2d domain, no base/upsample);
 * nearest base + depth-to-space + residual add only;
 * architecture variants at random init (numerics don't matter for
   timing): channels x {64, 96, 128}, s2d x {4, 8}, blocks x {2, 4}.

Each timing: median of 5 groups of 3 dispatches, batch 8, device-resident
inputs, synced by fetching one output element (block_until_ready does not
synchronize through the remote PJRT tunnel — CLAUDE.md).

Usage:  python bench_sr_profile.py          # prints one JSON line per row
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import bench_common as bc
from videorenderer_tpu.models.superres import (SuperResConfig, apply_fn,
                                               init_params)

BATCH = 8
REPEATS = 5
ITERS = 3


def _sync(o):
    # scalar-index fetch, NOT ravel(): raveling an NHWC f32 4K output
    # forces a layout copy whose (W, C=3) trailing dims tile to (8, 128)
    # lanes — a 42x padded 34 GB allocation (observed OOM)
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def timed(fn, args, frames: int) -> dict:
    out = fn(*args)
    _sync(out)                       # compile + warm
    groups = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / ITERS
        groups.append(frames / dt)
    med = float(np.median(groups))
    return {"fps": round(med, 1),
            "ms_per_frame": round(1000.0 / med, 3),
            "fps_minmax": [round(min(groups), 1), round(max(groups), 1)]}


def main() -> None:
    dev = jax.devices()[0]
    rng = np.random.default_rng(7)
    cfg = SuperResConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)

    # NHWC bf16 input in the net's native domain
    x_nhwc = jax.device_put(
        rng.random((BATCH, 1080, 1920, 3), np.float32), dev)
    x_nchw = jax.device_put(
        rng.random((BATCH, 3, 1080, 1920), np.float32), dev)

    rows = []

    def emit(name, fn_or_result, args=None, frames=BATCH):
        """Time a stage (or record a prebuilt result), print immediately
        so a crash in a later stage loses nothing."""
        if args is None:
            r = fn_or_result
        else:
            try:
                r = timed(fn_or_result, args, frames)
            except Exception as e:
                r = {"error": f"{type(e).__name__}: {e}"[:200]}
        rows.append((name, r))
        print(json.dumps({"stage": name, **r}), flush=True)

    # -- full bench chain (the c3sr row, for cross-reference; mirrors
    # bench_configs.run_config's c3sr build) --------------------------------
    from videorenderer_tpu.models.superres import enhance_plane_chw
    from videorenderer_tpu.pipeline import _pack_surface_xla, make_frame_fn
    plan = bc.build_plan("c3sr")
    fmt, w, h, _ = bc.input_spec("c3sr")
    sr_params, sr_cfg = bc.superres_params()
    sr_params = jax.device_put(sr_params, dev)
    base_fn = make_frame_fn(plan)
    chain = jax.jit(lambda p: _pack_surface_xla(
        enhance_plane_chw(sr_params, base_fn(p), sr_cfg), "rgba8"))
    planes = tuple(jax.device_put(np.asarray(a), dev)
                   for a in bc.make_planes(fmt, w, h, BATCH, seed=0))
    emit("c3sr_full_chain", chain, (planes,))
    emit("pipeline 1:1 only (no net)", jax.jit(base_fn), (planes,))

    # -- enhance hook (with transposes) vs apply_fn (NHWC native) -----------
    from videorenderer_tpu.models.superres import enhance_plane_chw
    emit("enhance_chw (moveaxis in/out)",
         jax.jit(lambda p: enhance_plane_chw(params, p, cfg)), (x_nchw,))
    emit("apply_fn (NHWC)",
         jax.jit(lambda p: apply_fn(params, p, cfg)), (x_nhwc,))

    # -- conv stack only: stop before depth-to-space/base -------------------
    def conv_stack(p):
        from videorenderer_tpu.models.superres import (_conv,
                                                       _space_to_depth)
        x = p.astype(cfg.dtype)
        h = _space_to_depth(x, cfg.s2d)
        h = jax.nn.relu(_conv(h, params["head"]["w"], params["head"]["b"]))
        for blk in params["body"]:
            r = jax.nn.relu(_conv(h, blk["c1"]["w"], blk["c1"]["b"]))
            r = _conv(r, blk["c2"]["w"], blk["c2"]["b"])
            h = h + r
        return _conv(h, params["tail"]["w"], params["tail"]["b"])

    emit("conv_stack only (s2d domain)", jax.jit(conv_stack), (x_nhwc,))

    # -- the non-conv remainder: s2d + base repeat + d2s + add + f32 cast ---
    def shuffle_only(p):
        from videorenderer_tpu.models.superres import (_depth_to_space,
                                                       _space_to_depth)
        x = p.astype(cfg.dtype)
        h = _space_to_depth(x, cfg.s2d)
        res = jnp.concatenate([h] * ((3 * (cfg.scale * cfg.s2d) ** 2)
                                     // h.shape[-1] + 1), -1)
        res = res[..., :3 * (cfg.scale * cfg.s2d) ** 2]
        res = _depth_to_space(res, cfg.scale * cfg.s2d, 3)
        base = jnp.repeat(jnp.repeat(x, cfg.scale, axis=1), cfg.scale,
                          axis=2)
        return (base + res).astype(jnp.float32)

    emit("shuffles + base + cast (no convs)", jax.jit(shuffle_only),
         (x_nhwc,))

    # -- architecture sweep (random init: timing only) ----------------------
    for ch in (64, 96, 128):
        for blocks in (2, 4):
            for s2d in (4, 8):
                if (ch, blocks, s2d) == (128, 4, 4):
                    continue          # the default, measured above
                c = SuperResConfig(channels=ch, num_blocks=blocks, s2d=s2d)
                p = init_params(jax.random.PRNGKey(1), c)
                emit(f"apply_fn ch={ch} blocks={blocks} s2d={s2d}",
                     jax.jit(lambda q, _c=c, _p=p: apply_fn(_p, q, _c)),
                     (x_nhwc,))


if __name__ == "__main__":
    main()
