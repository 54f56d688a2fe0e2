"""SuperRes tail experiments: kill the 4K interleave relayouts.

bench_sr_profile measured (batch 8, v5e): conv stack 4.5 ms/frame but the
NON-conv tail (depth-to-space + nearest base + add + cast) ~4 ms more —
the d2s/repeat are 4K lane-interleave relayouts (the strided-shuffle trap,
CLAUDE.md).  Variants measured here:

 * A  apply_fn_chw — current production path (reference number);
 * B  base-add in the s2d domain via a channel-duplication MATMUL
      (xs2d4 @ D, MXU) so the 4K domain sees ONE d2s and no repeat;
 * C  fused transposed conv: tail 3x3 conv + pixel-shuffle(K=8) + base
      add as a single lhs_dilation=8 conv (kernel 24x24, in 176ch
      = body(128) ++ head-input(48)) emitting NCHW directly — zero
      explicit interleave ops, everything in the XLA conv emitter;
 * A+pack / C+pack — with the packed-surface emit the c3sr row uses.

Equivalence of C with apply_fn_chw is unit-tested (tests/test_models.py);
this harness is timing-only (random weights).

Usage:  python bench_sr_tail.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from videorenderer_tpu.models.superres import (SuperResConfig, _conv,
                                               init_params)

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
    cfg = SuperResConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    # random tail (zero-init would let XLA fold the conv away)
    params["tail"]["w"] = (0.01 * jax.random.normal(
        jax.random.PRNGKey(1), params["tail"]["w"].shape)).astype(cfg.dtype)

    x_nchw = jax.device_put(
        rng.random((BATCH, 3, 1080, 1920), np.float32), dev)

    def emit(name, fn, args):
        try:
            r = timed(fn, args, BATCH)
        except Exception as e:
            r = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"stage": name, **r}), flush=True)

    from videorenderer_tpu.models.superres import apply_fn_chw
    emit("A apply_fn_chw (current)",
         jax.jit(lambda p: apply_fn_chw(params, p, cfg)), (x_nchw,))

    from videorenderer_tpu.models.superres import (apply_fn_chw_fused,
                                                   fuse_tail_weights)
    wfused = fuse_tail_weights(params, cfg)
    emit("C fused conv_transpose NCHW",
         jax.jit(lambda p: apply_fn_chw_fused(params, p, cfg,
                                              _wfused=wfused)), (x_nchw,))

    # -- B: dup-matmul base + single d2s --------------------------------
    k, s = cfg.s2d, cfg.scale
    K = s * k
    dup = np.zeros((3 * k * k, 3 * K * K), np.float32)
    for di in range(K):
        for dj in range(K):
            for c in range(3):
                dup[(di // s * k + dj // s) * 3 + c,
                    (di * K + dj) * 3 + c] = 1.0
    dupj = jnp.asarray(dup, cfg.dtype)

    def variant_b(p):
        from videorenderer_tpu.models.superres import _trunk
        x = p.astype(cfg.dtype)
        n = x.shape[0]
        hh, ww = x.shape[-2] // k, x.shape[-1] // k
        h = x.reshape(n, 3, hh, k, ww, k).transpose(0, 2, 4, 3, 5, 1) \
            .reshape(n, hh, ww, k * k * 3)
        res = _trunk(params, h) + h @ dupj
        res = res.reshape(n, hh, ww, K, K, 3).transpose(0, 5, 1, 3, 2, 4) \
            .reshape(n, 3, hh * K, ww * K)
        return res.astype(jnp.float32)

    emit("B dup-matmul base + one d2s", jax.jit(variant_b), (x_nchw,))

    # -- with the packed-surface emit (the c3sr consumer) ---------------
    from videorenderer_tpu.pipeline import _pack_surface_xla
    emit("A + pack rgba8",
         jax.jit(lambda p: _pack_surface_xla(
             apply_fn_chw(params, p, cfg), "rgba8")), (x_nchw,))
    emit("C + pack rgba8",
         jax.jit(lambda p: _pack_surface_xla(
             apply_fn_chw_fused(params, p, cfg, _wfused=wfused),
             "rgba8")), (x_nchw,))


if __name__ == "__main__":
    main()
