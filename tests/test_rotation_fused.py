"""Fused rotation (rotation rides the resize): transform algebra, dither
pattern transforms, and the rotated one-pass Jinc2 kernel vs rotating the
finished surface.  Reference semantics: rotation is a vertex permutation of
the resize pass, not an extra pass (FillVertices + ResizeShaderPass,
Source/DX11VideoProcessor.cpp:130-179,3115-3199)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                               SourceDescriptor)
from videorenderer_tpu.config import Upscaling
from videorenderer_tpu.csputils import CSP
from videorenderer_tpu.ops import dither as dither_ops
from videorenderer_tpu.ops import geometry as geo
from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline

ALL_RF = [(r, f) for r in (0, 90, 180, 270) for f in (False, True)]


@pytest.mark.parametrize("rotation,flip", ALL_RF)
def test_transform_axis_maps_algebra(rotation, flip):
    """rotate_flip(Wy^T P Wx) == Wy'^T rotate_flip(P) Wx' exactly."""
    rng = np.random.default_rng(rotation + flip)
    hi, ho, wi, wo = 6, 9, 5, 7
    wy = rng.standard_normal((hi, ho))
    wx = rng.standard_normal((wi, wo))
    p = rng.standard_normal((hi, wi))
    out = wy.T @ p @ wx
    ref = np.asarray(geo.rotate_flip(jnp.asarray(out), rotation, flip))
    wy2, wx2 = geo.transform_axis_maps(wy, wx, rotation, flip)
    p2 = np.asarray(geo.rotate_flip(jnp.asarray(p), rotation, flip))
    got = np.asarray(wy2).T @ p2 @ np.asarray(wx2)
    np.testing.assert_allclose(got, ref, atol=1e-12)


@pytest.mark.parametrize("rotation,flip", ALL_RF)
def test_transform_axis_maps_none_passthrough(rotation, flip):
    wy2, wx2 = geo.transform_axis_maps(None, None, rotation, flip)
    assert wy2 is None and wx2 is None


@pytest.mark.parametrize("rotation,flip", ALL_RF)
def test_bayer_field_transform(rotation, flip):
    """bayer_field with rf_decompose flags == the same rotate_flip of the
    plain tiled field (the pre-rotation dither phase, exactly)."""
    tr, fr, fc = geo.rf_decompose(rotation, flip)
    plain = np.asarray(dither_ops.bayer_field(64, 64))
    ref = np.asarray(geo.rotate_flip(jnp.asarray(plain), rotation, flip))
    got = np.asarray(dither_ops.bayer_field(64, 64, transpose=tr,
                                            flip_rows=fr, flip_cols=fc))
    np.testing.assert_array_equal(got, ref)


def test_make_frame_fn_rotation_fallback_matches():
    """Non-kernel paths: make_frame_fn(rotation=...) == rotate_flip of the
    unrotated output, bit-for-bit (the wrapper composition)."""
    rng = np.random.default_rng(3)
    w, h = 64, 48
    planes = (rng.integers(0, 256, (h, w), np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), np.uint8))
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=128, height=96, bits=8)
    plan = plan_pipeline(Settings(), src, dst)
    base = np.asarray(make_frame_fn(plan, pack_surface=True)(planes))
    for rotation, flip in ((90, True), (180, False), (270, False)):
        got = np.asarray(make_frame_fn(plan, pack_surface=True,
                                       rotation=rotation,
                                       flip=flip)(planes))
        ref = np.asarray(geo.rotate_flip(jnp.asarray(base), rotation, flip))
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("rotation,flip", [(90, True), (90, False),
                                           (270, False), (180, True)])
def test_jinc2_fused_rotation_interpret(monkeypatch, rotation, flip):
    """Rotation on the one-pass Jinc2 chain vs rotating the unrotated
    kernel's packed surface.  (90, True) is a pure transpose and rides the
    kernel as a transposed STORE (compute untouched — see
    test_jinc2_fused_transpose_bit_identical for the exact gate); the other
    rotations fall back to the XLA chain + post-rotation, whose per-rank
    accumulation order differs, so quantization-boundary codes may flip by
    1 LSB."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(17)
    w, h = 64, 48
    planes = (rng.integers(0, 256, (h, w), np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), np.uint8))
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=128, height=96, bits=8)
    st = Settings(upscaling=Upscaling.JINC2, use_dither=True)
    plan = plan_pipeline(st, src, dst)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(make_frame_fn(plan, fused=False,
                                        pack_surface=True)(planes))
        got = np.asarray(make_frame_fn(plan, fused=False, pack_surface=True,
                                       rotation=rotation,
                                       flip=flip)(planes))
    ref = np.asarray(geo.rotate_flip(jnp.asarray(base), rotation, flip))
    assert got.shape == ref.shape
    ga, ra = got.view(np.uint32), ref.view(np.uint32)
    # decoded channel deltas: at most 1 LSB, on isolated boundary codes
    db = np.stack([(ga >> s) & 0xFF for s in (0, 8, 16)], 0).astype(int)
    rb = np.stack([(ra >> s) & 0xFF for s in (0, 8, 16)], 0).astype(int)
    assert np.abs(db - rb).max() <= 1
    assert (db != rb).mean() < 0.02


def test_jinc2_fused_transpose_bit_identical(monkeypatch):
    """rotation 90 + flip (a pure transpose) rides the one-pass Jinc2
    kernel as a transposed STORE: the compute is the unrotated program's,
    so the packed surface must equal the transposed unrotated surface
    BIT-FOR-BIT (the r5 design constraint that replaced the rotated-
    geometry variant — interpret-exact but hardware-corrupt, see the note
    in pipeline.make_frame_fn)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(23)
    w, h = 64, 48
    planes = (rng.integers(0, 256, (h, w), np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), np.uint8))
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=128, height=96, bits=8)
    st = Settings(upscaling=Upscaling.JINC2, use_dither=True)
    plan = plan_pipeline(st, src, dst)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(make_frame_fn(plan, fused=False,
                                        pack_surface=True)(planes))
        got = np.asarray(make_frame_fn(plan, fused=False, pack_surface=True,
                                       rotation=90, flip=True)(planes))
    np.testing.assert_array_equal(got, base.T)
