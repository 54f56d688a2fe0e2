"""VideoHDR (c1vh) per-stage profile + layout/dtype variants.

c1vh measures 115 f/s (8.7 ms/frame) at 1080p — far below what a 3-layer
16-channel gain net plus transcendentals should cost.  Suspects: the gain
net runs f32 NHWC with C=16 minor (12.5% lane fill -> ~8x padded HBM
traffic per intermediate) and the hook wraps it in a moveaxis pair.

RESULT (batch 8, v5e, 2026-08-19, measured against the PRE-s2d
architecture this harness encodes): full chain 8.52 ms/frame, base+PQ
1.14, net-only 8.31 (f32 NHWC) / 6.86 (bf16 NHWC) / 8.45 (f32 NCHW) /
6.79 (bf16 NCHW) — the 3/16/1-channel full-resolution convs are
lane-starved in EVERY layout/dtype, so the fix was architectural: the
shipped gain net now runs in the s2d domain (models/videohdr.py), and
this harness stays as the measurement record that motivated it (its
net variants build the old conv shapes directly and do not depend on
the current VideoHDRConfig).

Stages/variants (batch 8, device-resident, one sync per group):
 * full enhance_plane_chw (the c1vh hook, baseline);
 * base expansion + PQ encode only (no net);
 * net only, as-is (f32 NHWC, with the moveaxis pair);
 * net only, bf16 NHWC;
 * net only, f32 NCHW (lanes = W, channels major);
 * net only, bf16 NCHW;
 * full chain rebuilt with the winning net variant.

Usage:  python bench_vh_variants.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from videorenderer_tpu.models.videohdr import (VideoHDRConfig,
                                               enhance_plane_chw,
                                               init_params,
                                               inverse_tonemap_base_linear)
from videorenderer_tpu.ops import transfer

BATCH = 8
REPEATS = 5
ITERS = 3


def _sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def timed(fn, args, frames: int) -> dict:
    out = fn(*args)
    _sync(out)
    groups = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / ITERS
        groups.append(frames / dt)
    med = float(np.median(groups))
    return {"fps": round(med, 1), "ms_per_frame": round(1000.0 / med, 3),
            "fps_minmax": [round(min(groups), 1), round(max(groups), 1)]}


def main() -> None:
    dev = jax.devices()[0]
    rng = np.random.default_rng(7)
    cfg = VideoHDRConfig()
    cur_params = init_params(jax.random.PRNGKey(0), cfg)
    # non-zero output layer so the gain branch isn't folded away
    cur_params["c3"]["w"] = (0.05 * jax.random.normal(
        jax.random.PRNGKey(1), cur_params["c3"]["w"].shape)).astype(cfg.dtype)

    # the PRE-s2d architecture this harness profiled: full-resolution
    # 3 -> 16 -> 16 -> 1 convs (built locally; the shipped model moved on)
    def old_conv(k, cin, cout):
        w = jax.random.normal(k, (3, 3, cin, cout), jnp.float32) * 0.05
        return {"w": w.astype(cfg.dtype), "b": jnp.zeros((cout,), cfg.dtype)}
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    params = {"c1": old_conv(ks[0], 3, 16), "c2": old_conv(ks[1], 16, 16),
              "c3": old_conv(ks[2], 16, 1)}

    x_chw = jax.device_put(
        rng.random((BATCH, 3, 1080, 1920), np.float32), dev)
    x_nhwc = jax.device_put(
        rng.random((BATCH, 1080, 1920, 3), np.float32), dev)

    def emit(name, fn, args):
        try:
            r = timed(jax.jit(fn), args, BATCH)
        except Exception as e:
            r = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"stage": name, **r}), flush=True)

    emit("full enhance_plane_chw (current shipped arch)",
         lambda p: enhance_plane_chw(cur_params, p, cfg), (x_chw,))

    def base_only(p):
        lin = inverse_tonemap_base_linear(p, cfg, axis=-3)
        return transfer.linear_to_st2084(lin, 10000.0)
    emit("base + PQ only (no net)", base_only, (x_chw,))

    def net_nhwc(p, dtype):
        h = p.astype(dtype)
        for key in ("c1", "c2"):
            h = jax.nn.relu(jax.lax.conv_general_dilated(
                h, params[key]["w"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
                + params[key]["b"].astype(dtype))
        h = jax.lax.conv_general_dilated(
            h, params["c3"]["w"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) \
            + params["c3"]["b"].astype(dtype)
        return jnp.tanh(h.astype(jnp.float32)) * 2.0

    emit("net only f32 NHWC", lambda p: net_nhwc(p, jnp.float32), (x_nhwc,))
    emit("net only bf16 NHWC", lambda p: net_nhwc(p, jnp.bfloat16), (x_nhwc,))

    def net_nchw(p, dtype):
        h = p.astype(dtype)
        for key in ("c1", "c2"):
            h = jax.nn.relu(jax.lax.conv_general_dilated(
                h, params[key]["w"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
                + params[key]["b"].astype(dtype)[None, :, None, None])
        h = jax.lax.conv_general_dilated(
            h, params["c3"]["w"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW")) \
            + params["c3"]["b"].astype(dtype)[None, :, None, None]
        return jnp.tanh(h.astype(jnp.float32)) * 2.0

    emit("net only f32 NCHW", lambda p: net_nchw(p, jnp.float32), (x_chw,))
    emit("net only bf16 NCHW", lambda p: net_nchw(p, jnp.bfloat16), (x_chw,))

    def full_nchw_bf16(p):
        log_gain = net_nchw(p, jnp.bfloat16)        # (n, 1, H, W)
        lin = inverse_tonemap_base_linear(p, cfg, axis=-3)
        return transfer.linear_to_st2084(lin * jnp.exp(log_gain), 10000.0)
    emit("full chain, bf16 NCHW net", full_nchw_bf16, (x_chw,))


if __name__ == "__main__":
    main()
