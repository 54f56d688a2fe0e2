"""End-to-end pipeline tests — golden-math verification of the BASELINE
configs at reduced sizes, against an independent float64 numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                               SourceDescriptor, VideoProcessor)
from videorenderer_tpu.config import ChromaScaling, Upscaling, Downscaling
from videorenderer_tpu.csputils import (CSP, CSPParams, Colorspace, Levels,
                                        Primaries, TRC, get_csp_matrix,
                                        bt2020_to_bt709_matrix)
from videorenderer_tpu.formats import unpack_frame
from videorenderer_tpu.ops.dither import bayer_matrix

import oracle


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(peak * peak / mse)


def _make_nv12(w, h, rng):
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    u = rng.integers(16, 241, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(16, 241, (h // 2, w // 2), dtype=np.uint8)
    uv = np.stack([u, v], -1).reshape(h // 2, w)
    return np.concatenate([y.ravel(), uv.ravel()]).tobytes(), (y, u, v)


def _oracle_config1(y, u, v, w, h):
    """NV12 BT.709 TV -> full RGB8, bilinear chroma (MPEG-2), ordered dither."""
    yf = y.astype(np.float64) / 255.0
    uf = u.astype(np.float64) / 255.0
    vf = v.astype(np.float64) / 255.0
    uu = oracle.chroma_upsample_420(uf, "bilinear", "mpeg2", h, w)
    vv = oracle.chroma_upsample_420(vf, "bilinear", "mpeg2", h, w)
    cm = get_csp_matrix(CSPParams(color=Colorspace(CSP.BT_709, Levels.TV),
                                  input_bits=8, texture_bits=8))
    rgb = np.stack([cm.m[i, 0] * yf + cm.m[i, 1] * uu + cm.m[i, 2] * vv + cm.c[i]
                    for i in range(3)])
    rgb = np.clip(rgb, 0.0, 1.0)
    d = np.tile(bayer_matrix(32).astype(np.float64), ((h + 31) // 32, (w + 31) // 32))[:h, :w]
    return np.floor(rgb * 255.0 + d) / 255.0


def test_config1_nv12_to_rgb8_exact():
    """BASELINE config 1 at reduced size: must match the float64 oracle to
    float32 precision (every quantized 8-bit code identical)."""
    w, h = 96, 64
    rng = np.random.default_rng(0)
    buf, (y, u, v) = _make_nv12(w, h, rng)
    frame = unpack_frame(ColorFormat.NV12, buf, w, h)

    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709, levels=Levels.TV)
    dst = OutputDescriptor(width=w, height=h, bits=8)
    vp = VideoProcessor(Settings(chroma_scaling=ChromaScaling.BILINEAR), src, dst)
    got = np.asarray(vp.process_frame(frame))

    ref = _oracle_config1(y, u, v, w, h)
    # identical 8-bit codes (float32 vs float64 may flip codes right at the
    # dither threshold — allow a tiny fraction of 1-LSB flips)
    diff = np.abs(got - ref) * 255.0
    assert (diff > 0.5).mean() < 2e-3
    assert psnr(got, ref) > 55.0


def test_sd_defaults_to_bt601():
    w, h = 64, 48  # "SD" (<=1024x576) => BT.601 default
    rng = np.random.default_rng(1)
    buf, _ = _make_nv12(w, h, rng)
    frame = unpack_frame(ColorFormat.NV12, buf, w, h)
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h)
    dst = OutputDescriptor(width=w, height=h, bits=8)
    vp601 = VideoProcessor(Settings(), src, dst)
    assert vp601.plan.src.matrix == CSP.BT_601
    vp709 = VideoProcessor(Settings(),
                           SourceDescriptor(format=ColorFormat.NV12, width=w,
                                            height=h, matrix=CSP.BT_709),
                           dst)
    a = np.asarray(vp601.process_frame(frame))
    b = np.asarray(vp709.process_frame(frame))
    assert np.abs(a - b).max() > 1e-3  # different matrices actually applied


def test_rgb_passthrough_identity():
    w, h = 32, 16
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = rgb[..., ::-1].tobytes()  # BGR byte order for RGB24
    frame = unpack_frame(ColorFormat.RGB24, buf, w, h)
    src = SourceDescriptor(format=ColorFormat.RGB24, width=w, height=h)
    dst = OutputDescriptor(width=w, height=h, bits=8)
    vp = VideoProcessor(Settings(use_dither=False), src, dst)
    out = np.asarray(vp.process_frame(frame))
    expected = np.moveaxis(rgb.astype(np.float64) / 255.0, -1, 0)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_gray_format():
    w, h = 32, 16
    y = np.full((h, w), 128, np.uint8)
    frame = unpack_frame(ColorFormat.Y8, y.tobytes(), w, h)
    src = SourceDescriptor(format=ColorFormat.Y8, width=w, height=h)
    dst = OutputDescriptor(width=w, height=h, bits=8)
    vp = VideoProcessor(Settings(use_dither=False), src, dst)
    out = np.asarray(vp.process_frame(frame))
    # gray mid-level, TV range: (128-16)/219 expanded
    expected = (128.0 - 16.0) / 219.0
    np.testing.assert_allclose(out, expected, atol=1.5 / 255)
    # R == G == B
    np.testing.assert_allclose(out[0], out[1], atol=1e-7)
    np.testing.assert_allclose(out[1], out[2], atol=1e-7)


def test_hdr10_p010_to_sdr():
    """Config 4 shape: P010 PQ BT.2020 -> SDR RGB8 via Hable + gamut map."""
    w, h = 64, 32
    rng = np.random.default_rng(3)
    y10 = rng.integers(64, 940, (h, w), dtype=np.uint16) << 6
    u10 = rng.integers(64, 960, (h // 2, w // 2), dtype=np.uint16) << 6
    v10 = rng.integers(64, 960, (h // 2, w // 2), dtype=np.uint16) << 6

    src = SourceDescriptor(format=ColorFormat.P010, width=w, height=h,
                           matrix=CSP.BT_2020_NC, levels=Levels.TV,
                           primaries=Primaries.BT_2020, transfer=TRC.PQ)
    dst = OutputDescriptor(width=w, height=h, bits=8, hdr=False)
    st = Settings(convert_to_sdr=True, use_dither=False)
    vp = VideoProcessor(st, src, dst)
    assert vp.plan.convert_to_sdr
    out = np.asarray(vp.process((y10, u10, v10)))
    assert out.shape == (3, h, w)
    assert np.all(out >= 0) and np.all(out <= 1)

    # independent oracle (float64)
    def pq_to_lin(x, factor):
        m1, m2 = 2610 / 16384, 2523 / 4096 * 128
        c1, c2, c3 = 3424 / 4096, 2413 / 4096 * 32, 2392 / 4096 * 32
        x = np.power(np.maximum(x, 0), 1 / m2)
        x = np.maximum(x - c1, 0) / (c2 - c3 * x)
        return np.power(x, 1 / m1) * factor

    yf = (y10.astype(np.float64)) / 65535.0
    uf = u10.astype(np.float64) / 65535.0
    vf = v10.astype(np.float64) / 65535.0
    uu = oracle.chroma_upsample_420(uf, "bilinear", "mpeg2", h, w)
    vv = oracle.chroma_upsample_420(vf, "bilinear", "mpeg2", h, w)
    cm = get_csp_matrix(CSPParams(color=Colorspace(CSP.BT_2020_NC, Levels.TV),
                                  input_bits=16, texture_bits=16))
    rgb = np.stack([cm.m[i, 0] * yf + cm.m[i, 1] * uu + cm.m[i, 2] * vv + cm.c[i]
                    for i in range(3)])
    x = np.clip(rgb, 0, 1)
    x = pq_to_lin(x, 10000.0 / 125.0)

    def hable(v):
        A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        return ((v * (A * v + C * B) + D * E) / (v * (A * v + B) + D * F)) - E / F

    x = hable(x) / hable(np.float64(4.8))
    gm = bt2020_to_bt709_matrix()
    x = np.einsum("ij,jhw->ihw", gm, x)
    x = np.clip(x, 0, 1) ** (1 / 2.2)
    ref = np.round(np.clip(x, 0, 1) * 255) / 255
    assert psnr(out, ref) > 55.0


def test_hlg_passthrough_to_pq():
    w, h = 32, 16
    src = SourceDescriptor(format=ColorFormat.P010, width=w, height=h,
                           matrix=CSP.BT_2020_NC, primaries=Primaries.BT_2020,
                           transfer=TRC.HLG)
    dst = OutputDescriptor(width=w, height=h, bits=10, hdr=True)
    vp = VideoProcessor(Settings(hdr_passthrough=True), src, dst)
    assert vp.plan.hlg_to_pq and not vp.plan.convert_to_sdr
    y = np.full((h, w), 600 << 6, np.uint16)
    u = np.full((h // 2, w // 2), 512 << 6, np.uint16)
    v = np.full((h // 2, w // 2), 512 << 6, np.uint16)
    out = np.asarray(vp.process((y, u, v)))
    assert out.shape == (3, h, w)
    assert np.all((out >= 0) & (out <= 1))


def test_pipeline_with_resize():
    """Convert + Lanczos3 upscale + dither, batched."""
    w, h = 32, 24
    rng = np.random.default_rng(4)
    y = rng.integers(0, 256, (2, h, w), dtype=np.uint8)       # batch of 2
    u = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (2, h // 2, w // 2), dtype=np.uint8)
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=w * 2, height=h * 2, bits=8)
    vp = VideoProcessor(Settings(upscaling=Upscaling.LANCZOS3), src, dst)
    out = np.asarray(vp.process((y, u, v)))
    assert out.shape == (2, 3, h * 2, w * 2)


def test_local_tonemap_in_pipeline():
    from videorenderer_tpu import HDR10Metadata
    from videorenderer_tpu.config import ToneMapType
    w, h = 32, 16
    src = SourceDescriptor(format=ColorFormat.P010, width=w, height=h,
                           matrix=CSP.BT_2020_NC, primaries=Primaries.BT_2020,
                           transfer=TRC.PQ,
                           hdr10=HDR10Metadata(max_cll=4000, max_fall=1000))
    dst = OutputDescriptor(width=w, height=h, bits=10, hdr=True)
    st = Settings(hdr_passthrough=True, hdr_local_tone_mapping=True,
                  hdr_local_tone_mapping_type=ToneMapType.BT2390,
                  hdr_display_max_nits=600)
    vp = VideoProcessor(st, src, dst)
    assert vp.plan.local_tonemap
    y = np.full((h, w), 900 << 6, np.uint16)
    u = np.full((h // 2, w // 2), 512 << 6, np.uint16)
    v = np.full((h // 2, w // 2), 512 << 6, np.uint16)
    out = np.asarray(vp.process((y, u, v)))
    assert np.all((out >= 0) & (out <= 1))


def test_video_rect_letterbox():
    """Placement of the scaled video inside a larger surface with black fill
    (FillBlack / SetDestinationPosition analogue)."""
    from videorenderer_tpu.pipeline import VideoProcessor as VP
    w, h = 32, 16
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=64, height=48, bits=8,
                           video_rect=(8, 12, 56, 36))  # 48x24 video area
    vp = VP(Settings(use_dither=False), src, dst)
    rng = np.random.default_rng(0)
    out = np.asarray(vp.process((
        rng.integers(100, 200, (h, w), np.uint8),
        np.full((h // 2, w // 2), 128, np.uint8),
        np.full((h // 2, w // 2), 128, np.uint8))))
    assert out.shape == (3, 48, 64)
    assert out[:, :12].max() == 0.0 and out[:, 36:].max() == 0.0  # bars
    assert out[:, 12:36, 8:56].mean() > 0.2  # video content present


def test_ycgco_matrix_path():
    """YCgCo sources route through the matrix path (the reference needs
    ps_fix_ycgco only because its fixed-function VP can't; our convert always
    uses the correct matrix)."""
    from videorenderer_tpu.csputils import CSPParams, Colorspace
    w, h = 16, 8
    src = SourceDescriptor(format=ColorFormat.YUV444P8, width=w, height=h,
                           matrix=CSP.YCGCO, levels=Levels.PC)
    dst = OutputDescriptor(width=w, height=h, bits=8)
    vp = VideoProcessor(Settings(use_dither=False), src, dst)
    # gray (Y=0.5, Cg=Co=0.5 biased): R=G=B=0.5
    y = np.full((h, w), 128, np.uint8)
    c = np.full((h, w), 128, np.uint8)
    out = np.asarray(vp.process((y, c, c)))
    np.testing.assert_allclose(out[0], out[1], atol=0.01)
    np.testing.assert_allclose(out[1], out[2], atol=0.01)
    # green-ish: Cg high raises G, lowers R and B
    cg_hi = np.full((h, w), 200, np.uint8)
    out2 = np.asarray(vp.process((y, cg_hi, c)))
    assert out2[1].mean() > out2[0].mean() and out2[1].mean() > out2[2].mean()


def test_pack_surface_output_xla():
    """pack_surface=True yields the packed-dword backbuffer surface, equal
    to packing the float output (both bit depths)."""
    import jax
    from videorenderer_tpu.pipeline import (VideoProcessor, make_frame_fn,
                                            plan_pipeline)
    from videorenderer_tpu import formats as fmts

    rng = np.random.default_rng(41)
    planes = (rng.integers(0, 256, (16, 32), np.uint8),
              rng.integers(0, 256, (8, 16), np.uint8),
              rng.integers(0, 256, (8, 16), np.uint8))
    src = SourceDescriptor(format=ColorFormat.NV12, width=32, height=16,
                           matrix=CSP.BT_709)
    for bits, fmt in ((10, "rgb10a2"), (8, "rgba8")):
        dst = OutputDescriptor(width=32, height=16, bits=bits)
        vp = VideoProcessor(Settings(), src, dst, pack_surface=True)
        packed = np.asarray(vp.process(planes)).view(np.uint32)
        assert packed.shape == (16, 32)
        plain = np.asarray(jax.jit(make_frame_fn(
            plan_pipeline(Settings(), src, dst)))(planes))
        maxc = 1023 if bits == 10 else 255
        q = lambda x: (np.clip(x, 0, 1) * maxc + 0.5).astype(np.uint32)
        if fmt == "rgb10a2":
            ref = (q(plain[0]) | (q(plain[1]) << 10) | (q(plain[2]) << 20)
                   | np.uint32(0xC0000000))
            # round-trips through the screenshot decoder
            rgb = fmts.unpack_rgb10(packed)
            assert np.abs(rgb - np.moveaxis(plain, 0, -1)).max() < 1 / 1023
        else:
            ref = (q(plain[0]) | (q(plain[1]) << 8) | (q(plain[2]) << 16)
                   | np.uint32(0xFF000000))
        np.testing.assert_array_equal(packed, ref)


def test_pack_surface_kernel_path_interpret(monkeypatch):
    """In-kernel surface packing (rows3 path) matches the XLA packer."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline

    rng = np.random.default_rng(43)
    planes = (rng.integers(0, 256, (48, 64), np.uint8),
              rng.integers(0, 256, (24, 32), np.uint8),
              rng.integers(0, 256, (24, 32), np.uint8))
    src = SourceDescriptor(format=ColorFormat.NV12, width=64, height=48,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=128, height=96, bits=10)
    ref = np.asarray(make_frame_fn(
        plan_pipeline(Settings(use_accel_backend=False), src, dst),
        pack_surface=True)(planes)).view(np.uint32)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # FLOAT16 pins full-f32 W-pass intermediates: this test checks the
    # in-kernel PACKER vs the XLA packer; the default AUTOINT int16
    # intermediate adds its own LSB flips (covered by
    # test_banded_mid16_intermediate_* and the hardware PSNR gates)
    from videorenderer_tpu.config import TexFormat
    fn = make_frame_fn(plan_pipeline(Settings(tex_format=TexFormat.FLOAT16),
                                     src, dst), pack_surface=True)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes)).view(np.uint32)
    assert got.shape == ref.shape == (96, 128)
    # kernel-vs-XLA: only isolated dither-threshold flips in single fields
    d = (got != ref)
    assert d.mean() < 0.02


def test_default_autoint_end_to_end_band(monkeypatch):
    """Default-settings (AUTOINT) kernel path vs the staged XLA path.

    Under the default TexFormat.AUTOINT the fused kernels carry int16
    fixed-point W-pass intermediates (a deliberate 2^-14 band vs the
    staged f32 path, mirroring the reference's UNORM intermediate
    textures, Source/DX11VideoProcessor.cpp:1145-1151). This golden test
    pins the band: the end-to-end result must stay within a tight PSNR
    bar of the staged path rather than bit-equal (the FLOAT16 tests pin
    bit-equality)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline

    rng = np.random.default_rng(44)
    planes = (rng.integers(0, 256, (48, 64), np.uint8),
              rng.integers(0, 256, (24, 32), np.uint8),
              rng.integers(0, 256, (24, 32), np.uint8))
    src = SourceDescriptor(format=ColorFormat.NV12, width=64, height=48,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=128, height=96, bits=8)
    ref = np.asarray(make_frame_fn(
        plan_pipeline(Settings(use_accel_backend=False), src, dst))(planes))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fn = make_frame_fn(plan_pipeline(Settings(), src, dst))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes))
    assert got.shape == ref.shape
    # quantized 8-bit outputs: the 2^-14 intermediate band can flip a code
    # by at most 1 LSB, and only on quantization boundaries
    assert np.abs(got - ref).max() <= 1.01 / 255.0
    assert psnr(got, ref) >= 55.0


def test_pack_surface_jinc2_kernel_interpret(monkeypatch):
    """In-kernel surface packing on the 3-plane Jinc2 path."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from videorenderer_tpu.config import Upscaling
    from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline

    rng = np.random.default_rng(47)
    planes = (rng.integers(0, 256, (48, 64), np.uint8),
              rng.integers(0, 256, (24, 32), np.uint8),
              rng.integers(0, 256, (24, 32), np.uint8))
    src = SourceDescriptor(format=ColorFormat.NV12, width=64, height=48,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=128, height=96, bits=8)
    st = lambda accel: Settings(upscaling=Upscaling.JINC2, use_dither=True,
                                use_accel_backend=accel)
    ref = np.asarray(make_frame_fn(plan_pipeline(st(False), src, dst),
                                   fused=False,
                                   pack_surface=True)(planes)).view(np.uint32)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fn = make_frame_fn(plan_pipeline(st(True), src, dst), fused=False,
                       pack_surface=True)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes)).view(np.uint32)
    assert got.shape == ref.shape == (96, 128)
    assert (got != ref).mean() < 0.02      # isolated dither-boundary flips


def test_pack_surface_serving_paths():
    """pack_surface=True on the serving fn (fused + DoVi split-fused +
    generic fallback) equals packing the unpacked serving output."""
    from videorenderer_tpu.config import Upscaling
    from videorenderer_tpu.ops import dovi as dovi_ops
    from videorenderer_tpu.pipeline import (_pack_surface_xla, make_serving_fn,
                                            plan_pipeline)
    import jax.numpy as jnp

    rng = np.random.default_rng(53)
    planes = (rng.integers(0, 256, (16, 32), np.uint8),
              rng.integers(0, 256, (8, 16), np.uint8),
              rng.integers(0, 256, (8, 16), np.uint8))
    src_plain = SourceDescriptor(format=ColorFormat.NV12, width=32, height=16,
                                 matrix=CSP.BT_709)
    meta = dovi_ops.DoviMetadata(
        curves=(dovi_ops.identity_curve(),) * 3,
        ycc_to_rgb_matrix=np.array([[1, 0, 1.4746],
                                    [1, -0.164553, -0.571353],
                                    [1, 1.8814, 0]]),
        ycc_to_rgb_offset=np.array([0.0, 0.5, 0.5]),
        rgb_to_lms_matrix=np.linalg.inv(dovi_ops.DOVI_LMS2RGB))
    src_dovi = SourceDescriptor(format=ColorFormat.NV12, width=32, height=16,
                                matrix=CSP.BT_709, dovi=meta)
    dst = OutputDescriptor(width=32, height=16, bits=8)
    cases = [
        (Settings(), src_plain, {"cmat": {"m": np.eye(3, dtype=np.float32),
                                          "c": np.zeros(3, np.float32)}}),
        (Settings(), src_dovi, {}),                       # split-fused
        (Settings(upscaling=Upscaling.JINC2), src_plain, {}),  # generic
    ]
    for st, src, rt in cases:
        plan = plan_pipeline(st, src, dst)
        plain = make_serving_fn(plan)(planes, rt)
        packed = np.asarray(make_serving_fn(plan, pack_surface=True)(
            planes, rt))
        ref = np.asarray(_pack_surface_xla(jnp.asarray(plain), "rgba8"))
        np.testing.assert_array_equal(packed, ref)


def test_serving_rt_key_validation():
    """A typo'd rt key fails loudly with the allowed set instead of silently
    leaving the kernel path (VERDICT r2 #9)."""
    import pytest
    from videorenderer_tpu.pipeline import (HDR10Metadata, make_serving_fn,
                                            plan_pipeline, serving_rt_keys)
    from videorenderer_tpu.csputils import Primaries, TRC

    src = SourceDescriptor(format=ColorFormat.P010, width=64, height=32,
                           matrix=CSP.BT_2020_NC, primaries=Primaries.BT_2020,
                           transfer=TRC.PQ, hdr10=HDR10Metadata())
    dst = OutputDescriptor(width=64, height=32, bits=10, hdr=True)
    st = Settings(convert_to_sdr=False, hdr_passthrough=True,
                  hdr_local_tone_mapping=True, hdr_display_max_nits=600)
    plan = plan_pipeline(st, src, dst)
    fn = make_serving_fn(plan)
    assert fn.allowed_rt_keys == frozenset(serving_rt_keys(plan))
    assert "hdr" in fn.allowed_rt_keys and "cmat" in fn.allowed_rt_keys
    rng = np.random.default_rng(0)
    planes = tuple(jnp.asarray(rng.integers(64, 941, s, np.uint16) << 6)
                   for s in ((32, 64), (16, 32), (16, 32)))
    fn(planes, {"hdr": {"mastering_min_nits": 0.01,
                        "mastering_max_nits": 1000.0, "max_cll": 900.0,
                        "max_fall": 300.0, "display_max_nits": 500.0}})
    with pytest.raises(ValueError, match="hdr10"):
        fn(planes, {"hdr10": {}})      # the typo'd key from the VERDICT
    # a known key whose stage is absent in THIS plan also raises
    with pytest.raises(ValueError, match="l2_trims"):
        fn(planes, {"l2_trims": {}})
    with pytest.raises(ValueError, match="dovi_curves"):
        fn(planes, {"dovi_curves": {}})


def test_serving_dovi_structure_guard_default():
    """make_serving_fn surfaces the plan's reshape structure and its
    pack_curves validates against it by default (ADVICE r2)."""
    import pytest
    from videorenderer_tpu.ops import dovi as dovi_ops
    from videorenderer_tpu.pipeline import make_serving_fn, plan_pipeline

    meta = dovi_ops.DoviMetadata(
        curves=(dovi_ops.identity_curve(),) * 3,
        ycc_to_rgb_matrix=np.eye(3), ycc_to_rgb_offset=np.zeros(3),
        rgb_to_lms_matrix=np.linalg.inv(dovi_ops.DOVI_LMS2RGB))
    src = SourceDescriptor(format=ColorFormat.P010, width=64, height=32,
                           matrix=CSP.BT_2020_NC, transfer=TRC.PQ,
                           primaries=Primaries.BT_2020, dovi=meta)
    dst = OutputDescriptor(width=64, height=32, bits=10)
    plan = plan_pipeline(Settings(convert_to_sdr=True), src, dst)
    fn = make_serving_fn(plan)
    assert fn.dovi_structure == dovi_ops.curve_structure(meta)
    packed = fn.pack_curves(meta)          # same structure: fine
    assert "pivots" in packed
    # structurally different scene metadata raises through the default path
    from videorenderer_tpu.ops.dovi import ReshapeCurve
    poly2 = dovi_ops.DoviMetadata(
        curves=(ReshapeCurve(pivots=(0.5,),
                             poly=np.array([[0.0, 1.0, 0.0]] * 2),
                             method=(0, 0)),) * 3,
        ycc_to_rgb_matrix=np.eye(3), ycc_to_rgb_offset=np.zeros(3),
        rgb_to_lms_matrix=np.linalg.inv(dovi_ops.DOVI_LMS2RGB))
    with pytest.raises(ValueError, match="structure"):
        fn.pack_curves(poly2)
