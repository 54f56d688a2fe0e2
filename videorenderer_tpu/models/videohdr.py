"""Learned SDR->HDR inverse tone mapping — the "RTX Video HDR" slot.

The reference exposes NVIDIA's driver-side "TrueHDR" video processor
extension (SetRTXVideoHDR, Source/D3D11VP.cpp:846-891), gated to 8-bit SDR
sources being presented on an HDR display (InitializeD3D11VP,
Source/DX11VideoProcessor.cpp selection of ``m_bVPUseRTXVideoHDR``).  That
is an opaque NN; the TPU-native equivalent is explicit: a compact conv net
that predicts a per-pixel luminance-expansion gain over a deterministic
inverse-tone-mapping base, producing BT.2020 PQ output.

The deterministic base (usable without trained weights) follows the common
inverse-Reinhard expansion: linearize sRGB, expand highlights toward the
display peak, convert 709->2020 primaries, encode PQ.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import csputils
from ..ops import transfer


@dataclass(frozen=True)
class VideoHDRConfig:
    channels: int = 16
    peak_nits: float = 1000.0
    sdr_nits: float = 203.0       # BT.2408 reference white
    dtype: object = jnp.bfloat16


def inverse_tonemap_base_linear(rgb_srgb: jnp.ndarray, cfg: VideoHDRConfig,
                                axis: int = -3) -> jnp.ndarray:
    """Deterministic SDR->HDR expansion up to linear BT.2020 nits: sRGB ->
    linear -> inverse-Reinhard highlight expansion to ``peak_nits`` ->
    BT.2020.  (:func:`apply_fn` gains this *before* PQ encoding, skipping
    the encode+decode pair a PQ-domain base would force — 12 pows/pixel.)"""
    lin_n = transfer.srgb_like_to_linear(rgb_srgb)  # 0..1, 1 = SDR white
    # inverse Reinhard parameterized so SDR white lands on the display peak:
    # out = s*x / (1 - x*(1 - s/k)); x=1 -> k, slope ~s near black
    s, k = cfg.sdr_nits, cfg.peak_nits
    expanded = s * lin_n / jnp.maximum(1.0 - lin_n * (1.0 - s / k), s / k)
    expanded = jnp.minimum(expanded, k)
    gm = jnp.asarray(csputils.gamut_conversion_matrix(
        csputils.Primaries.BT_709, csputils.Primaries.BT_2020), expanded.dtype)
    r, g, b = (jnp.take(expanded, i, axis=axis) for i in range(3))
    x = jnp.stack([gm[i, 0] * r + gm[i, 1] * g + gm[i, 2] * b
                   for i in range(3)], axis=axis)
    return jnp.maximum(x, 0.0)


def inverse_tonemap_base(rgb_srgb: jnp.ndarray, cfg: VideoHDRConfig,
                         axis: int = -3) -> jnp.ndarray:
    """Deterministic SDR->HDR expansion: sRGB -> linear nits -> inverse-
    Reinhard highlight expansion to ``peak_nits`` -> BT.2020 -> PQ."""
    return transfer.linear_to_st2084(
        inverse_tonemap_base_linear(rgb_srgb, cfg, axis=axis), 10000.0)


def init_params(key: jax.Array, cfg: VideoHDRConfig = VideoHDRConfig()):
    """3-layer gain-prediction net (NHWC), zero-init output so the untrained
    model reduces exactly to the deterministic base."""
    def conv_init(k, cin, cout, zero=False):
        if zero:
            w = jnp.zeros((3, 3, cin, cout), jnp.float32)
        else:
            std = float(np.sqrt(2.0 / (9 * cin)))
            w = jax.random.normal(k, (3, 3, cin, cout), jnp.float32) * std
        return {"w": w.astype(cfg.dtype), "b": jnp.zeros((cout,), cfg.dtype)}

    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "c1": conv_init(k1, 3, cfg.channels),
        "c2": conv_init(k2, cfg.channels, cfg.channels),
        "c3": conv_init(k3, cfg.channels, 1, zero=True),
    }


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["w"].astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(jnp.float32)


def apply_fn(params, sdr_rgb_nhwc: jnp.ndarray,
             cfg: VideoHDRConfig = VideoHDRConfig()) -> jnp.ndarray:
    """(N,H,W,3) sRGB in [0,1] -> (N,H,W,3) PQ/BT.2020 in [0,1].

    The net predicts a log-gain field applied to the base expansion's linear
    light; zero-initialized output layer => identity to the base."""
    x = sdr_rgb_nhwc
    h = jax.nn.relu(_conv(x, params["c1"]))
    h = jax.nn.relu(_conv(h, params["c2"]))
    log_gain = jnp.tanh(_conv(h, params["c3"])) * 2.0    # gain in [e^-2, e^2]

    # gain the base's LINEAR light directly: encoding the base to PQ and
    # decoding it back (the naive composition) is 12 wasted pows/pixel
    base_lin = inverse_tonemap_base_linear(jnp.moveaxis(x, -1, -3), cfg,
                                           axis=-3)
    gained = base_lin * jnp.exp(jnp.moveaxis(log_gain, -1, -3))
    out = transfer.linear_to_st2084(gained, 10000.0)
    return jnp.moveaxis(out, -3, -1)


def enhance_plane_chw(params, rgb_chw: jnp.ndarray,
                      cfg: VideoHDRConfig = VideoHDRConfig()) -> jnp.ndarray:
    """Pipeline hook: (..., 3, H, W) sRGB -> PQ/BT.2020."""
    lead = rgb_chw.shape[:-3]
    x = rgb_chw.reshape((-1,) + rgb_chw.shape[-3:])
    y = apply_fn(params, jnp.moveaxis(x, -3, -1), cfg)
    return jnp.moveaxis(y, -1, -3).reshape(lead + rgb_chw.shape[-3:])
