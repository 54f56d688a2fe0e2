"""SuperRes tail, round 2: GEMM-spread and channel-major d2s variants.

Round 1 (bench_sr_tail.py) measured: the naive lhs-dilated fused conv is
3.6x slower (oc=3 starves MXU lanes) and the 4K depth-to-space transpose
itself is the ~4-5 ms monster.  These variants restructure the tail so the
hard lane-interleave is either a permutation GEMM (MXU) or starts from a
channel-MAJOR (NCHW) layout where d/c/e extraction is free:

 * V0  trunk + base-fold + bias in the s2d domain only (cost floor of
       everything before the interleave);
 * V1  one-dot spread: tail channels ordered (d, c, e); lhs
       (n, hh, ww, 3K, K) contracts (xi, e) against a one-hot
       M (ww, K, W_out) — the interleave IS the GEMM's output indexing,
       then only free major-dim moves remain;
 * V2  NCHW tail conv (channels major) + pure reshape/transpose d2s
       (one hard e-into-lanes transpose, on bf16);
 * V5  pack-early: quantize + dword-pack in the s2d domain (channel-major
       slices are free), then one hard int32 transpose of the (d, e)
       phases — 4 bytes/pixel instead of 6, pack already done.

All variants include the packed-surface emit and fold the nearest base +
bias into the tail conv input (concat head-input + identity taps), so each
number is an end-to-end net cost comparable to round 1's
"A + pack rgba8" (9.45 ms/frame at batch 8).

Measured (batch 8, v5e, 2026-08-19): s2d4 V0 4.76 / V1 6.38 / V2 10.2 /
V5 6.86; s2d8 V1 4.91 / V2 8.66 / V5 4.28 ms/frame.  V1 (-32% vs the
9.45 baseline) was promoted to the production `apply_fn_chw`; the round-1
lhs-dilated fused conv (3.6x slower, oc=3 starves MXU lanes) was dropped.

Usage:  python bench_sr_tail2.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from videorenderer_tpu.models.superres import (SuperResConfig, _conv,
                                               init_params)
from videorenderer_tpu.pipeline import _pack_surface_xla

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


def _perm_dce(cfg):
    """Permutation: standard tail channel ch=(d*K+e)*3+c -> (d*3+c)*K+e."""
    K = cfg.scale * cfg.s2d
    perm = np.empty(3 * K * K, np.int64)
    for d in range(K):
        for e in range(K):
            for c in range(3):
                perm[(d * 3 + c) * K + e] = (d * K + e) * 3 + c
    return perm


def _perm_cde(cfg):
    """Permutation: standard ch -> c*K*K + d*K + e (c major, for V5)."""
    K = cfg.scale * cfg.s2d
    perm = np.empty(3 * K * K, np.int64)
    for d in range(K):
        for e in range(K):
            for c in range(3):
                perm[c * K * K + d * K + e] = (d * K + e) * 3 + c
    return perm


def _base_taps(cfg, perm):
    """(3k^2, 3KK) identity matrix reproducing the nearest base in the
    PERMUTED tail channel order; rides the tail conv as extra 1x1-center
    input taps on the head-input channels."""
    k, s = cfg.s2d, cfg.scale
    K = s * k
    inv = np.argsort(perm)
    D = np.zeros((3 * k * k, 3 * K * K), np.float32)
    for d in range(K):
        for e in range(K):
            for c in range(3):
                std = (d * K + e) * 3 + c
                D[((d // s) * k + (e // s)) * 3 + c, inv[std]] = 1.0
    return D


def _aug_tail(params, cfg, perm):
    """Tail weights permuted to `perm` order with base taps appended:
    w_aug (3, 3, C + 3k^2, 3KK), consumed on concat([body, head_in])."""
    wt = np.asarray(params["tail"]["w"], np.float32)[..., perm]
    bt = np.asarray(params["tail"]["b"], np.float32)[perm]
    D = _base_taps(cfg, perm)
    aug = np.zeros((3, 3, D.shape[0], wt.shape[-1]), np.float32)
    aug[1, 1] = D
    w_aug = np.concatenate([wt, aug], axis=2)
    return jnp.asarray(w_aug, cfg.dtype), jnp.asarray(bt, cfg.dtype)


def _s2d_chw(x, k):
    n, _, H, W = x.shape
    hh, ww = H // k, W // k
    return x.reshape(n, 3, hh, k, ww, k).transpose(0, 2, 4, 3, 5, 1) \
        .reshape(n, hh, ww, k * k * 3)


def _body(params, h0):
    h = jax.nn.relu(_conv(h0, params["head"]["w"], params["head"]["b"]))
    for blk in params["body"]:
        r = jax.nn.relu(_conv(h, blk["c1"]["w"], blk["c1"]["b"]))
        r = _conv(r, blk["c2"]["w"], blk["c2"]["b"])
        h = h + r
    return h


def make_v0(params, cfg, perm):
    w_aug, bt = _aug_tail(params, cfg, perm)

    def fn(x_chw):
        x = x_chw.astype(cfg.dtype)
        h0 = _s2d_chw(x, cfg.s2d)
        h = _body(params, h0)
        return _conv(jnp.concatenate([h, h0], -1), w_aug, bt)
    return fn


def make_v1(params, cfg, perm):
    w_aug, bt = _aug_tail(params, cfg, perm)
    K = cfg.scale * cfg.s2d

    def fn(x_chw):
        x = x_chw.astype(cfg.dtype)
        n, _, H, W = x.shape
        h0 = _s2d_chw(x, cfg.s2d)
        res = _conv(jnp.concatenate([_body(params, h0), h0], -1), w_aug, bt)
        hh, ww = res.shape[1], res.shape[2]
        lhs = res.reshape(n, hh, ww, 3 * K, K)
        M = np.zeros((ww, K, ww * K), np.float32)
        xi = np.arange(ww)[:, None]
        e = np.arange(K)[None, :]
        M[xi, e, xi * K + e] = 1.0
        out = jax.lax.dot_general(
            lhs, jnp.asarray(M, cfg.dtype),
            (((2, 4), (0, 1)), ((), ())))           # (n, hh, 3K, Wout)
        out = out.reshape(n, hh, K, 3, ww * K).transpose(0, 3, 1, 2, 4) \
            .reshape(n, 3, hh * K, ww * K).astype(jnp.float32)
        return _pack_surface_xla(out, "rgba8")
    return fn


def make_v2(params, cfg, perm):
    w_aug, bt = _aug_tail(params, cfg, perm)
    K = cfg.scale * cfg.s2d

    def fn(x_chw):
        x = x_chw.astype(cfg.dtype)
        n = x.shape[0]
        h0 = _s2d_chw(x, cfg.s2d)
        h_aug = jnp.concatenate([_body(params, h0), h0], -1)
        res = jax.lax.conv_general_dilated(
            h_aug, w_aug.astype(h_aug.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NCHW"))
        res = res + bt.astype(res.dtype)[None, :, None, None]
        hh, ww = res.shape[2], res.shape[3]
        t = res.reshape(n, K, 3, K, hh, ww).transpose(0, 2, 4, 1, 5, 3) \
            .reshape(n, 3, hh * K, ww * K).astype(jnp.float32)
        return _pack_surface_xla(t, "rgba8")
    return fn


def make_v5(params, cfg, perm_c):
    w_aug, bt = _aug_tail(params, cfg, perm_c)
    K = cfg.scale * cfg.s2d
    KK = K * K

    def fn(x_chw):
        x = x_chw.astype(cfg.dtype)
        n = x.shape[0]
        h0 = _s2d_chw(x, cfg.s2d)
        h_aug = jnp.concatenate([_body(params, h0), h0], -1)
        res = jax.lax.conv_general_dilated(
            h_aug, w_aug.astype(h_aug.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NCHW"))
        res = res + bt.astype(res.dtype)[None, :, None, None]
        hh, ww = res.shape[2], res.shape[3]
        q = (jnp.clip(res.astype(jnp.float32), 0.0, 1.0) * 255.0
             + 0.5).astype(jnp.int32)
        dw = (q[:, :KK] | (q[:, KK:2 * KK] << 8) | (q[:, 2 * KK:] << 16)
              | jnp.int32(-16777216))               # (n, KK, hh, ww)
        out = dw.reshape(n, K, K, hh, ww).transpose(0, 3, 1, 4, 2) \
            .reshape(n, hh * K, ww * K)
        return out
    return fn


def main() -> None:
    dev = jax.devices()[0]
    rng = np.random.default_rng(7)
    x_nchw = jax.device_put(
        rng.random((BATCH, 3, 1080, 1920), np.float32), dev)

    def emit(name, fn):
        try:
            r = timed(jax.jit(fn), (x_nchw,), BATCH)
        except Exception as e:
            r = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"stage": name, **r}), flush=True)

    for tag, cfg in (("s2d4", SuperResConfig()),
                     ("s2d8", SuperResConfig(s2d=8))):
        params = init_params(jax.random.PRNGKey(0), cfg)
        params["tail"]["w"] = (0.01 * jax.random.normal(
            jax.random.PRNGKey(1),
            params["tail"]["w"].shape)).astype(cfg.dtype)
        perm = _perm_dce(cfg)
        perm_c = _perm_cde(cfg)
        if tag == "s2d4":
            emit(f"{tag} V0 s2d-domain only", make_v0(params, cfg, perm))
        emit(f"{tag} V1 GEMM-spread + pack", make_v1(params, cfg, perm))
        emit(f"{tag} V2 NCHW transpose d2s + pack", make_v2(params, cfg, perm))
        emit(f"{tag} V5 pack-early int32 d2s", make_v5(params, cfg, perm_c))

        # correctness cross-check of the packed output (V1 vs V5) on a
        # small slice: both must produce identical dwords
        try:
            xs = jax.device_put(
                rng.random((1, 3, 64, 64), np.float32), dev)
            a = np.asarray(jax.jit(make_v1(params, cfg, perm))(xs))
            b = np.asarray(jax.jit(make_v5(params, cfg, perm_c))(xs))
            print(json.dumps({"stage": f"{tag} V1-vs-V5 dword equality",
                              "equal_pct": round(float((a == b).mean())
                                                 * 100, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"stage": f"{tag} equality check",
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
