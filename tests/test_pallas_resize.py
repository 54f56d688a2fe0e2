"""Banded Pallas resize kernel vs the dense matmul (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from videorenderer_tpu.config import Downscaling, Upscaling
from videorenderer_tpu.kernels import resize_pallas as rp
from videorenderer_tpu.ops import scale


def test_pack_band_covers_all_nonzeros():
    mat = scale.upscale_matrix(Upscaling.LANCZOS3, 512, 256)
    starts, bands, kb, w_in_pad = rp.pack_band_for(np.asarray(mat))
    w_in, w_out = mat.shape
    # reconstruct dense from bands and compare
    dense = np.zeros_like(mat)
    for j in range(bands.shape[0]):
        s = int(starts[j])
        block = bands[j][: min(kb, w_in - s)]
        dense[s:s + block.shape[0], j * rp.TILE_N:(j + 1) * rp.TILE_N] += \
            block[:, : min(rp.TILE_N, w_out - j * rp.TILE_N)]
    np.testing.assert_allclose(dense, mat, atol=1e-7)


@pytest.mark.parametrize("sizes,method", [
    ((512, 256), Upscaling.LANCZOS3),
    ((256, 512), Upscaling.CATMULL_ROM),
    ((512, 128), None),  # downscale hamming
])
def test_banded_matches_dense_interpret(sizes, method):
    w_in, w_out = sizes
    if method is None:
        mat = scale.downscale_matrix(Downscaling.HAMMING, w_in, w_out)
    else:
        mat = scale.upscale_matrix(method, w_in, w_out)
    rng = np.random.default_rng(0)
    x = rng.random((3, 300, w_in), dtype=np.float32)
    ref = x.astype(np.float64) @ mat
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.banded_resize_last_axis(jnp.asarray(x), np.asarray(mat)))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert got.shape == (3, 300, w_out)


def test_banded_axis_h():
    mat = scale.upscale_matrix(Upscaling.CATMULL_ROM, 128, 256)
    rng = np.random.default_rng(1)
    x = rng.random((2, 128, 140), dtype=np.float32)
    ref = np.einsum("chw,hH->cHw", x.astype(np.float64), mat)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.banded_resize_axis(jnp.asarray(x), np.asarray(mat), axis=-2))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_banded_u16_input_interpret():
    """Raw uint16 planes stream directly; normalization folds into weights."""
    mat = scale.upscale_matrix(Upscaling.LANCZOS3, 512, 256)
    rng = np.random.default_rng(3)
    x = (rng.integers(0, 1024, (600, 512), dtype=np.uint16) << 6)
    ref = (x.astype(np.float64) / 65535.0) @ mat
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.banded_resize_last_axis(
            jnp.asarray(x), np.asarray(mat), pre_scale=1 / 65535.0))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_banded_rows_u16_interpret():
    mat = scale.upscale_matrix(Upscaling.CATMULL_ROM, 128, 64)
    rng = np.random.default_rng(4)
    x = (rng.integers(0, 1024, (2, 128, 256), dtype=np.uint16) << 6)
    ref = np.einsum("chw,hH->cHw", x.astype(np.float64) / 65535.0, mat)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.banded_resize_rows(
            jnp.asarray(x), np.asarray(mat), pre_scale=1 / 65535.0))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_banded_u8_input_interpret():
    mat = scale.upscale_matrix(Upscaling.CATMULL_ROM, 256, 512)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (300, 256), dtype=np.uint8)
    ref = (x.astype(np.float64) / 255.0) @ mat
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.banded_resize_last_axis(
            jnp.asarray(x), np.asarray(mat), pre_scale=1 / 255.0))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_v210_device_unpack_matches_host():
    from videorenderer_tpu.kernels.unpack_device import v210_unpack_device
    from videorenderer_tpu import formats
    w, h = 48, 4
    row_bytes = ((w + 47) // 48) * 128
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 256, row_bytes * h, dtype=np.uint8).tobytes()
    formats.USE_NATIVE = False
    ref = formats.unpack_frame(formats.ColorFormat.V210, buf, w, h)
    dwords = np.frombuffer(buf, np.uint32).reshape(h, row_bytes // 4)
    y, u, v = v210_unpack_device(jnp.asarray(dwords), w)
    np.testing.assert_array_equal(np.asarray(y), ref.planes[0])
    np.testing.assert_array_equal(np.asarray(u), ref.planes[1])
    np.testing.assert_array_equal(np.asarray(v), ref.planes[2])


def test_nv12_y210_device_unpack():
    from videorenderer_tpu.kernels.unpack_device import (nv12_split_device,
                                                         y210_unpack_device)
    from videorenderer_tpu import formats
    w, h = 16, 8
    rng = np.random.default_rng(8)
    buf = rng.integers(0, 256, w * h * 3 // 2, dtype=np.uint8)
    ref = formats.unpack_frame(formats.ColorFormat.NV12, buf.tobytes(), w, h)
    y, u, v = nv12_split_device(jnp.asarray(buf), w, h)
    np.testing.assert_array_equal(np.asarray(y), ref.planes[0])
    np.testing.assert_array_equal(np.asarray(u), ref.planes[1])
    np.testing.assert_array_equal(np.asarray(v), ref.planes[2])

    words = rng.integers(0, 65536, (h, w * 2), dtype=np.uint16)
    ref2 = formats.unpack_frame(formats.ColorFormat.Y210, words.tobytes(), w, h)
    y2, u2, v2 = y210_unpack_device(jnp.asarray(words), w)
    np.testing.assert_array_equal(np.asarray(y2), ref2.planes[0])
    np.testing.assert_array_equal(np.asarray(u2), ref2.planes[1])
    np.testing.assert_array_equal(np.asarray(v2), ref2.planes[2])


def test_rows3_tail_interpret():
    """Fused 3-plane H-resize + epilogue kernel vs the dense composition."""
    my = scale.upscale_matrix(Upscaling.CATMULL_ROM, 256, 128)
    mc = scale.upscale_matrix(Upscaling.LANCZOS3, 64, 128)
    rng = np.random.default_rng(11)
    y = rng.random((2, 256, 256), dtype=np.float32)
    u = rng.random((2, 64, 256), dtype=np.float32)
    v = rng.random((2, 64, 256), dtype=np.float32)
    m = np.asarray([[1.0, 0.0, 1.4], [1.0, -0.2, -0.7], [1.0, 1.8, 0.0]],
                   np.float32)

    def epi(yt, ut, vt):
        from videorenderer_tpu.ops.dither import ordered_dither_iota
        rgb = jnp.stack([m[i, 0] * yt + m[i, 1] * ut + m[i, 2] * vt
                         for i in range(3)], axis=0)
        return ordered_dither_iota(jnp.clip(rgb, 0.0, 1.0), 8)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.rows3_tail(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v),
                                       np.asarray(my, np.float32),
                                       np.asarray(mc, np.float32), 128, epi))
    yr = np.einsum("bhw,hH->bHw", y.astype(np.float64), my)
    ur = np.einsum("bhw,hH->bHw", u.astype(np.float64), mc)
    vr = np.einsum("bhw,hH->bHw", v.astype(np.float64), mc)
    rgb = np.stack([m[i, 0] * yr + m[i, 1] * ur + m[i, 2] * vr
                    for i in range(3)], axis=1)
    from videorenderer_tpu.ops.dither import ordered_dither
    ref = np.asarray(ordered_dither(
        jnp.asarray(np.clip(rgb, 0.0, 1.0), dtype=jnp.float32), 8))
    assert got.shape == (2, 3, 128, 256)
    # quantized codes: identical except bf16-split boundary flips
    mismatch = (got != ref).mean()
    assert mismatch < 0.01, mismatch
    np.testing.assert_allclose(got, ref, atol=1.01 / 255)


def test_rows3_tail_raw_slice_path_interpret():
    """No-matrix planes take the direct-slice path with in-kernel u8
    normalization (the 1:1 NV12 configuration)."""
    mc = scale.upscale_matrix(Upscaling.CATMULL_ROM, 64, 128)
    rng = np.random.default_rng(12)
    y = rng.integers(0, 256, (1, 128, 128), dtype=np.uint8)
    u = rng.integers(0, 256, (1, 64, 128), dtype=np.uint8)
    v = rng.integers(0, 256, (1, 64, 128), dtype=np.uint8)

    def epi(yt, ut, vt):
        return jnp.stack([yt, ut, vt], axis=0)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.rows3_tail(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            None, np.asarray(mc, np.float32), 128, epi,
            y_scale=1 / 255.0, c_scale=1 / 255.0))
    ys = y.astype(np.float64) / 255.0
    ur = np.einsum("bhw,hH->bHw", u.astype(np.float64) / 255.0, mc)
    vr = np.einsum("bhw,hH->bHw", v.astype(np.float64) / 255.0, mc)
    ref = np.stack([ys, ur, vr], axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_jinc2_fused_kernel_interpret():
    """One-pass fused Jinc2 kernel == the dense low-rank composition
    (which itself matches the gather formulation to ~3e-7)."""
    from videorenderer_tpu.kernels.jinc2_pallas import jinc2_resize_fused
    from videorenderer_tpu.ops.scale import _jinc2_lowrank
    rng = np.random.default_rng(13)
    for (h, w, oh, ow) in [(24, 32, 48, 64), (24, 32, 37, 53),
                           (48, 64, 48, 128)]:
        x = rng.random((2, h, w)).astype(np.float32)
        ref = np.asarray(_jinc2_lowrank(jnp.asarray(x), oh, ow))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(jinc2_resize_fused(jnp.asarray(x), oh, ow))
        assert got.shape == (2, oh, ow)
        np.testing.assert_allclose(got, ref, atol=5e-5)


def test_jinc2_fused_kernel_vs_gather_interpret():
    """Fused kernel vs the dense gather formulation.  The low-rank
    factorization truncates singular values at _JINC2_SV_CUTOFF=1e-4
    (ops/scale.py), which bounds the normalized per-pixel weight error
    at ~1e-3 on long-phase-period geometries like this 30->61 / 40->90
    one — so the agreement band is the documented truncation band, not
    float rounding (exact-rank geometries like 2x stay at ~3e-7, covered
    by test_jinc2_fused_kernel_interpret's lowrank comparison)."""
    from videorenderer_tpu.kernels.jinc2_pallas import jinc2_resize_fused
    from videorenderer_tpu.ops import scale
    rng = np.random.default_rng(14)
    x = rng.random((1, 30, 40)).astype(np.float32)
    ref = np.asarray(scale._jinc2_gather(jnp.asarray(x), 61, 90))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jinc2_resize_fused(jnp.asarray(x), 61, 90))
    np.testing.assert_allclose(got, ref, atol=1e-3)
    # and the band is tight in the mean: >= 65 dB on [0,1) random content
    psnr = -10.0 * np.log10(np.mean((got - ref) ** 2) + 1e-30)
    assert psnr > 65.0, psnr


def test_mega3_tail_interpret():
    """Whole-pipeline mega kernel (raw ints -> W -> H -> cmat -> out) vs
    the dense composition, 4:2:0-shaped planes with a 2:1 downscale."""
    from videorenderer_tpu.ops.chroma import chroma_upsample_matrices
    from videorenderer_tpu.config import ChromaScaling
    from videorenderer_tpu.csputils import ChromaLocation
    rng = np.random.default_rng(21)
    H, W, OH, OW = 256, 512, 128, 256
    y = (rng.integers(0, 1024, (2, H, W), np.uint16) << 6)
    u = (rng.integers(0, 1024, (2, H // 2, W // 2), np.uint16) << 6)
    v = (rng.integers(0, 1024, (2, H // 2, W // 2), np.uint16) << 6)
    wx = scale.upscale_matrix(Upscaling.LANCZOS3, W, OW)
    wy = scale.upscale_matrix(Upscaling.LANCZOS3, H, OH)
    ux, uy = chroma_upsample_matrices(W // 2, H // 2, 420,
                                      ChromaScaling.BILINEAR,
                                      ChromaLocation.MPEG2)
    cwx = np.asarray(ux @ wx, np.float32)
    cwy = np.asarray(uy @ wy, np.float32)
    m = np.asarray([[1.0, 0.0, 1.4], [1.0, -0.2, -0.7], [1.0, 1.8, 0.0]],
                   np.float32)

    def epi(yt, ut, vt):
        return jnp.stack([m[i, 0] * yt + m[i, 1] * ut + m[i, 2] * vt
                          for i in range(3)], axis=0)

    norm = 1.0 / 65535.0
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.mega3_tail(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            np.asarray(wx, np.float32), cwx,
            np.asarray(wy, np.float32), cwy, OH, epi, norm))

    def dense(p, a, b):
        x = p.astype(np.float64) * norm
        return np.einsum("bhw,wW,hH->bHW", x, a, b)
    yr = dense(y, wx, wy)
    ur = dense(u, cwx.astype(np.float64), cwy.astype(np.float64))
    vr = dense(v, cwx.astype(np.float64), cwy.astype(np.float64))
    ref = np.stack([m[i, 0] * yr + m[i, 1] * ur + m[i, 2] * vr
                    for i in range(3)], axis=1)
    assert got.shape == (2, 3, OH, OW)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_mega3_tail_identity_paths_interpret():
    """1:1 luma (slice path, in-kernel normalization) + chroma H-only
    upsample — the NV12 1:1 configuration."""
    from videorenderer_tpu.ops.chroma import chroma_upsample_matrices
    from videorenderer_tpu.config import ChromaScaling
    from videorenderer_tpu.csputils import ChromaLocation
    rng = np.random.default_rng(22)
    H, W = 128, 256
    y = rng.integers(0, 256, (1, H, W), np.uint8)
    u = rng.integers(0, 256, (1, H // 2, W // 2), np.uint8)
    v = rng.integers(0, 256, (1, H // 2, W // 2), np.uint8)
    ux, uy = chroma_upsample_matrices(W // 2, H // 2, 420,
                                      ChromaScaling.BILINEAR,
                                      ChromaLocation.MPEG2)

    def epi(yt, ut, vt):
        return jnp.stack([yt, ut, vt], axis=0)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.mega3_tail(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            None, np.asarray(ux, np.float32),
            None, np.asarray(uy, np.float32), H, epi, 1 / 255.0))
    yr = y.astype(np.float64) / 255.0
    ur = np.einsum("bhw,wW,hH->bHW", u.astype(np.float64) / 255.0, ux, uy)
    vr = np.einsum("bhw,wW,hH->bHW", v.astype(np.float64) / 255.0, ux, uy)
    ref = np.stack([yr, ur, vr], axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_rows3_tail_rt_scalars_interpret():
    """Serving mode: the color matrix arrives as SMEM scalars per call."""
    mc = scale.upscale_matrix(Upscaling.CATMULL_ROM, 64, 128)
    rng = np.random.default_rng(23)
    y = rng.random((1, 128, 128), dtype=np.float32)
    u = rng.random((1, 64, 128), dtype=np.float32)
    v = rng.random((1, 64, 128), dtype=np.float32)
    m = np.asarray([[1.0, 0.1, 1.4, 0.01], [0.9, -0.2, -0.7, 0.02],
                    [1.1, 1.8, 0.05, -0.03]], np.float32)

    def epi(yt, ut, vt, rt_ref):
        return jnp.stack([rt_ref[4 * i] * yt + rt_ref[4 * i + 1] * ut
                          + rt_ref[4 * i + 2] * vt + rt_ref[4 * i + 3]
                          for i in range(3)], axis=0)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(rp.rows3_tail(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            None, np.asarray(mc, np.float32), 128, epi,
            rt_scalars=jnp.asarray(m.reshape(-1))))
    ur = np.einsum("bhw,hH->bHw", u.astype(np.float64), mc)
    vr = np.einsum("bhw,hH->bHw", v.astype(np.float64), mc)
    ref = np.stack([m[i, 0] * y + m[i, 1] * ur + m[i, 2] * vr + m[i, 3]
                    for i in range(3)], axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-4)


# ---------------------------------------------------------------------------
# serving-mode fused tail: full SMEM rt layout (cmat + HDR10 + L2 trims)
# ---------------------------------------------------------------------------

def _rt_plan(with_trims: bool):
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.config import TexFormat, ToneMapType
    from videorenderer_tpu.csputils import CSP, Primaries, TRC
    from videorenderer_tpu.pipeline import HDR10Metadata, plan_pipeline

    kw = {}
    if with_trims:
        from videorenderer_tpu.ops.dovi_ext import (DoviExtensions,
                                                    L2Extension)
        kw["dovi_ext"] = DoviExtensions(
            l2=(L2Extension(target_max_pq=2851,   # ~600 nits
                            trim_slope=2200, trim_offset=2100,
                            trim_power=1800, trim_chroma_weight=2048,
                            trim_saturation_gain=2048),))
    src = SourceDescriptor(
        format=ColorFormat.P010, width=64, height=48,
        matrix=CSP.BT_2020_NC, primaries=Primaries.BT_2020, transfer=TRC.PQ,
        hdr10=HDR10Metadata(mastering_max_nits=4000.0, max_cll=3000.0,
                            max_fall=800.0), **kw)
    dst = OutputDescriptor(width=128, height=96, bits=10, hdr=True)
    # FLOAT16 pins full-f32 intermediates: these tests check the kernel's
    # split-bf16 exactness vs the staged path; the AUTOINT int16
    # intermediate band is covered by test_banded_mid16_intermediate_*
    st = Settings(convert_to_sdr=False, hdr_passthrough=True,
                  hdr_local_tone_mapping=True,
                  hdr_local_tone_mapping_type=ToneMapType.BT2390,
                  hdr_display_max_nits=600, tex_format=TexFormat.FLOAT16)
    return plan_pipeline(st, src, dst)


@pytest.mark.parametrize("with_trims", [False, True])
def test_fused_rt_tail_local_tonemap_interpret(monkeypatch, with_trims):
    """The rows3 serving path with the full SMEM scalar layout (color matrix
    + HDR10 luminance metadata + DoVi L2 trims) and the local tone map fused
    into the kernel tail must match the XLA serving path."""
    from videorenderer_tpu.pipeline import (_rt_layout, make_serving_fn,
                                            _can_fuse)

    plan = _rt_plan(with_trims)
    assert plan.local_tonemap and _can_fuse(plan)
    names = [n for n, _ in _rt_layout(plan)]
    assert names == (["cmat", "hdr", "l2"] if with_trims else ["cmat", "hdr"])

    rng = np.random.default_rng(7)
    planes = (rng.integers(64, 941, (48, 64), np.uint16) << 6,
              rng.integers(64, 961, (24, 32), np.uint16) << 6,
              rng.integers(64, 961, (24, 32), np.uint16) << 6)
    rt = {"hdr": {"mastering_min_nits": 0.01, "mastering_max_nits": 2000.0,
                  "max_cll": 1500.0, "max_fall": 500.0,
                  "display_max_nits": 650.0}}
    if with_trims:
        rt["l2_trims"] = {"chroma_weight": 0.1, "saturation_gain": 0.9,
                          "trim_slope": 1.1, "trim_offset": 0.02,
                          "trim_power": 0.95}

    ref = np.asarray(make_serving_fn(plan)(planes, rt))   # CPU XLA path

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fn = make_serving_fn(plan)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes, rt))

    assert got.shape == ref.shape == (3, 96, 128)
    # 10-bit dithered output: the kernel's split-bf16 contractions differ
    # from the dense XLA matmuls by ~1e-5 pre-quantization, so values right
    # at a dither threshold may flip by exactly one code — but never more
    # (the trims' pow/EOTF chain can amplify that to two codes worst-case)
    d = np.abs(got - ref)
    assert d.max() <= 2.5 / 1023
    assert (d > 0.5 / 1023).mean() < 0.01


def test_jinc2_convert_fused_interpret():
    """3-plane convert+Jinc2 kernel (raw NV12 in, dithered RGB out) vs the
    staged XLA path (chroma upsample -> cmat -> 2D Jinc2 + AR -> dither)."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.config import Upscaling
    from videorenderer_tpu.csputils import CSP
    from videorenderer_tpu.kernels.jinc2_pallas import jinc2_convert_fused
    from videorenderer_tpu.ops.chroma import chroma_upsample_matrices
    from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline

    W, H, OW, OH = 64, 48, 128, 96
    st = Settings(upscaling=Upscaling.JINC2, use_dither=True,
                  use_accel_backend=False)
    src = SourceDescriptor(format=ColorFormat.NV12, width=W, height=H,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=OW, height=OH, bits=8)
    plan = plan_pipeline(st, src, dst)

    rng = np.random.default_rng(11)
    planes = (rng.integers(0, 256, (2, H, W), np.uint8),
              rng.integers(0, 256, (2, H // 2, W // 2), np.uint8),
              rng.integers(0, 256, (2, H // 2, W // 2), np.uint8))
    ref = np.asarray(jax.jit(make_frame_fn(plan, fused=False))(planes))

    ux, uy = chroma_upsample_matrices(W // 2, H // 2, 420, st.chroma_scaling,
                                      plan.src.chroma_location)
    from videorenderer_tpu.ops import dither as dither_ops

    def epi(tile):
        return dither_ops.ordered_dither_iota(jnp.clip(tile, 0.0, 1.0), 8)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jinc2_convert_fused(
            jnp.asarray(planes[0]), jnp.asarray(planes[1]),
            jnp.asarray(planes[2]),
            np.asarray(uy, np.float32), np.asarray(ux, np.float32),
            plan.cmat_m, plan.cmat_c, OH, OW,
            1.0 / 255.0, 1.0 / 255.0, epilogue=epi))

    assert got.shape == ref.shape == (2, 3, OH, OW)
    d = np.abs(got - ref)
    assert d.max() <= 1.5 / 255          # isolated dither-boundary flips only
    assert (d > 0.5 / 255).mean() < 0.01


def test_jinc2_convert_pipeline_path_interpret(monkeypatch):
    """make_frame_fn routes a 2D-upscale Jinc2 plan through the 3-plane
    convert+Jinc2 kernel on the accel backend; output matches the XLA
    composition."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.config import Upscaling
    from videorenderer_tpu.csputils import CSP
    from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline

    W, H, OW, OH = 64, 48, 160, 120   # 2.5x both axes (generic-rank path)
    src = SourceDescriptor(format=ColorFormat.NV12, width=W, height=H,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=OW, height=OH, bits=8)
    rng = np.random.default_rng(13)
    planes = (rng.integers(0, 256, (H, W), np.uint8),
              rng.integers(0, 256, (H // 2, W // 2), np.uint8),
              rng.integers(0, 256, (H // 2, W // 2), np.uint8))
    plan_x = plan_pipeline(Settings(upscaling=Upscaling.JINC2, use_dither=True,
                                    use_accel_backend=False), src, dst)
    ref = np.asarray(make_frame_fn(plan_x, fused=False)(planes))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan_k = plan_pipeline(Settings(upscaling=Upscaling.JINC2,
                                    use_dither=True), src, dst)
    fn = make_frame_fn(plan_k, fused=False)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes))
    d = np.abs(got - ref)
    assert got.shape == ref.shape == (3, OH, OW)
    assert d.max() <= 1.5 / 255
    assert (d > 0.5 / 255).mean() < 0.01


def test_dovi_stage_b_rows3_tail_interpret(monkeypatch):
    """The DoVi split-fused pipeline's stage B (RGB resize + corrections +
    local tone map + dither) runs through rows3_tail on the accel backend
    with runtime HDR scalars over SMEM; output matches the XLA stage B."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.config import ToneMapType, Upscaling
    from videorenderer_tpu.csputils import CSP, Primaries, TRC
    from videorenderer_tpu.ops import dovi as dovi_ops
    from videorenderer_tpu.pipeline import (HDR10Metadata, make_serving_fn,
                                            plan_pipeline)

    meta = dovi_ops.DoviMetadata(
        curves=(dovi_ops.identity_curve(),) * 3,
        ycc_to_rgb_matrix=np.array([[1, 0, 1.4746],
                                    [1, -0.164553, -0.571353],
                                    [1, 1.8814, 0]]),
        ycc_to_rgb_offset=np.array([0.0, 0.5, 0.5]),
        rgb_to_lms_matrix=np.linalg.inv(dovi_ops.DOVI_LMS2RGB))

    def mk_plan(accel):
        src = SourceDescriptor(format=ColorFormat.P010, width=64, height=48,
                               transfer=TRC.PQ, primaries=Primaries.BT_2020,
                               matrix=CSP.BT_2020_NC, dovi=meta,
                               hdr10=HDR10Metadata())
        dst = OutputDescriptor(width=128, height=96, bits=10, hdr=True)
        st = Settings(convert_to_sdr=False, hdr_passthrough=True,
                      hdr_local_tone_mapping=True,
                      hdr_local_tone_mapping_type=ToneMapType.BT2390,
                      hdr_display_max_nits=600,
                      upscaling=Upscaling.CATMULL_ROM,
                      use_accel_backend=accel)
        return plan_pipeline(st, src, dst)

    rng = np.random.default_rng(17)
    planes = (rng.integers(64, 941, (48, 64), np.uint16) << 6,
              rng.integers(64, 961, (24, 32), np.uint16) << 6,
              rng.integers(64, 961, (24, 32), np.uint16) << 6)
    rt = {"hdr": {"mastering_min_nits": 0.005, "mastering_max_nits": 2000.0,
                  "max_cll": 1500.0, "max_fall": 500.0,
                  "display_max_nits": 650.0}}
    ref = np.asarray(make_serving_fn(mk_plan(False))(planes, rt))

    monkeypatch.setenv("VRT_TPU_DOVI_MID", "0")   # pin the two-stage form
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fn = make_serving_fn(mk_plan(True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes, rt))
    assert got.shape == ref.shape == (3, 96, 128)
    d = np.abs(got - ref)
    assert d.max() <= 2.5 / 1023
    assert (d > 0.5 / 1023).mean() < 0.01

    # the mid chain (default) with the same hdr-only rt set — the
    # cols3_tail epilogue consumes the SMEM scalars there instead
    monkeypatch.setenv("VRT_TPU_DOVI_MID", "1")
    fn_mid = make_serving_fn(mk_plan(True))
    with pltpu.force_tpu_interpret_mode():
        got_mid = np.asarray(fn_mid(planes, rt))
    d = np.abs(got_mid - ref)
    assert d.max() <= 2.5 / 1023
    assert (d > 0.5 / 1023).mean() < 0.01


def test_dovi_stage_a_smem_curves_mmr_interpret(monkeypatch):
    """Stage-A kernel reshape with a nontrivial STRUCTURE — 2-piece luma
    poly and single-piece order-2 MMR chroma — through the SMEM scalar
    vector, vs the XLA path with the same runtime curves."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.config import Upscaling
    from videorenderer_tpu.csputils import CSP, Primaries, TRC
    from videorenderer_tpu.ops import dovi as dovi_ops
    from videorenderer_tpu.pipeline import (HDR10Metadata, make_serving_fn,
                                            plan_pipeline)

    rng = np.random.default_rng(19)
    mmr_coef = rng.normal(0, 0.05, (1, 3, 7))
    mmr = dovi_ops.ReshapeCurve(
        pivots=(), method=(1,), poly=np.zeros((1, 3)),
        mmr_order=(2,), mmr_constant=(0.4,), mmr_coef=mmr_coef)
    luma = dovi_ops.ReshapeCurve(
        pivots=(0.5,), method=(0, 0),
        poly=np.array([[0.02, 0.9, 0.1], [0.0, 1.0, -0.05]]))
    meta = dovi_ops.DoviMetadata(
        curves=(luma, mmr, mmr),
        ycc_to_rgb_matrix=np.array([[1, 0, 1.4746],
                                    [1, -0.164553, -0.571353],
                                    [1, 1.8814, 0]]),
        ycc_to_rgb_offset=np.array([0.0, 0.5, 0.5]),
        rgb_to_lms_matrix=np.linalg.inv(dovi_ops.DOVI_LMS2RGB))

    def mk_plan(accel):
        src = SourceDescriptor(format=ColorFormat.P010, width=64, height=48,
                               transfer=TRC.PQ, primaries=Primaries.BT_2020,
                               matrix=CSP.BT_2020_NC, dovi=meta,
                               hdr10=HDR10Metadata())
        dst = OutputDescriptor(width=32, height=24, bits=10)
        st = Settings(convert_to_sdr=True, use_accel_backend=accel)
        return plan_pipeline(st, src, dst)

    planes = (rng.integers(64, 941, (48, 64), np.uint16) << 6,
              rng.integers(64, 961, (24, 32), np.uint16) << 6,
              rng.integers(64, 961, (24, 32), np.uint16) << 6)
    curves = {k: jnp.asarray(v) for k, v in dovi_ops.pack_curves(meta).items()}
    rt = {"dovi_curves": curves}
    ref = np.asarray(make_serving_fn(mk_plan(False))(planes, rt))

    monkeypatch.setenv("VRT_TPU_DOVI_MID", "0")   # pin the two-stage form
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fn = make_serving_fn(mk_plan(True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes, rt))
    d = np.abs(got - ref)
    assert got.shape == ref.shape == (3, 24, 32)
    assert d.max() <= 2.5 / 1023
    assert (d > 0.5 / 1023).mean() < 0.01


def test_dovi_mid_kernel_opt_in_interpret(monkeypatch):
    """The single-intermediate rows3_mid + cols3_tail DoVi chain (the
    DEFAULT since the fast-pow change made the saved intermediate traffic
    win; VRT_TPU_DOVI_MID=0 selects two-stage) matches the XLA path with
    runtime curves."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.csputils import CSP, Primaries, TRC
    from videorenderer_tpu.ops import dovi as dovi_ops
    from videorenderer_tpu.pipeline import (HDR10Metadata, make_serving_fn,
                                            plan_pipeline)

    rng = np.random.default_rng(29)
    meta = dovi_ops.DoviMetadata(
        curves=(dovi_ops.identity_curve(),) * 3,
        ycc_to_rgb_matrix=np.array([[1, 0, 1.4746],
                                    [1, -0.164553, -0.571353],
                                    [1, 1.8814, 0]]),
        ycc_to_rgb_offset=np.array([0.0, 0.5, 0.5]),
        rgb_to_lms_matrix=np.linalg.inv(dovi_ops.DOVI_LMS2RGB))

    def mk_plan(accel):
        src = SourceDescriptor(format=ColorFormat.P010, width=64, height=48,
                               transfer=TRC.PQ, primaries=Primaries.BT_2020,
                               matrix=CSP.BT_2020_NC, dovi=meta,
                               hdr10=HDR10Metadata())
        dst = OutputDescriptor(width=32, height=24, bits=10)
        st = Settings(convert_to_sdr=True, use_accel_backend=accel)
        return plan_pipeline(st, src, dst)

    planes = (rng.integers(64, 941, (48, 64), np.uint16) << 6,
              rng.integers(64, 961, (24, 32), np.uint16) << 6,
              rng.integers(64, 961, (24, 32), np.uint16) << 6)
    curves = {k: jnp.asarray(v) for k, v in dovi_ops.pack_curves(meta).items()}
    rt = {"dovi_curves": curves}
    ref = np.asarray(make_serving_fn(mk_plan(False))(planes, rt))

    monkeypatch.setenv("VRT_TPU_DOVI_MID", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fn = make_serving_fn(mk_plan(True))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes, rt))
    d = np.abs(got - ref)
    assert got.shape == ref.shape == (3, 24, 32)
    assert d.max() <= 2.5 / 1023
    assert (d > 0.5 / 1023).mean() < 0.01


def test_jinc2_convert_fused_422_interpret(monkeypatch):
    """3-plane convert+Jinc2 kernel with a 4:2:2 source (W-only chroma
    upsample composition, chroma height = luma height)."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.config import Upscaling
    from videorenderer_tpu.csputils import CSP
    from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline

    W, H, OW, OH = 64, 32, 128, 64
    src = SourceDescriptor(format=ColorFormat.YUY2, width=W, height=H,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=OW, height=OH, bits=8)
    rng = np.random.default_rng(23)
    planes = (rng.integers(0, 256, (H, W), np.uint8),
              rng.integers(0, 256, (H, W // 2), np.uint8),
              rng.integers(0, 256, (H, W // 2), np.uint8))
    plan_x = plan_pipeline(Settings(upscaling=Upscaling.JINC2, use_dither=True,
                                    use_accel_backend=False), src, dst)
    ref = np.asarray(make_frame_fn(plan_x, fused=False)(planes))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan_k = plan_pipeline(Settings(upscaling=Upscaling.JINC2,
                                    use_dither=True), src, dst)
    fn = make_frame_fn(plan_k, fused=False)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(planes))
    d = np.abs(got - ref)
    assert got.shape == ref.shape == (3, OH, OW)
    assert d.max() <= 1.5 / 255
    assert (d > 0.5 / 255).mean() < 0.01


def test_kernel_path_fuzz_interpret(monkeypatch):
    """Randomized shapes through the ACCEL kernel routes (kconvert, rows3,
    3-plane Jinc2) in interpret mode, checked against the pure-XLA backend.
    Catches window/padding/alignment bugs at shapes the targeted tests
    don't hit."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.config import Upscaling
    from videorenderer_tpu.csputils import CSP
    from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline

    rng = np.random.default_rng(77)
    cases = []
    for _ in range(3):      # lanczos3 fused (rows3) at random sizes
        w, h = int(rng.integers(3, 20)) * 4, int(rng.integers(3, 16)) * 4
        ow, oh = int(rng.integers(3, 20)) * 4, int(rng.integers(3, 16)) * 4
        cases.append((Upscaling.LANCZOS3, w, h, ow, oh))
    for _ in range(2):      # jinc2 up/up at random sizes (3-plane kernel)
        w, h = int(rng.integers(6, 16)) * 4, int(rng.integers(6, 12)) * 4
        ow, oh = w * 2 + 8, h * 2 + 8
        cases.append((Upscaling.JINC2, w, h, ow, oh))

    for i, (up, w, h, ow, oh) in enumerate(cases):
        src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                               matrix=CSP.BT_709)
        dst = OutputDescriptor(width=ow, height=oh, bits=8)
        planes = (rng.integers(0, 256, (h, w), np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8))
        plan_x = plan_pipeline(Settings(upscaling=up, use_dither=True,
                                        use_accel_backend=False), src, dst)
        ref = np.asarray(make_frame_fn(plan_x)(planes))

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        plan_k = plan_pipeline(Settings(upscaling=up, use_dither=True),
                               src, dst)
        fn = make_frame_fn(plan_k)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fn(planes))
        monkeypatch.undo()
        d = np.abs(got - ref)
        assert got.shape == ref.shape == (3, oh, ow), (i, up, w, h, ow, oh)
        assert d.max() <= 1.5 / 255, (i, up, w, h, ow, oh, d.max())
        assert (d > 0.5 / 255).mean() < 0.01, (i, up, w, h, ow, oh)


def test_deint_kernel_path_interpret():
    """Fully-fused deint chain (deint3_rows_dual + cols3_tail) vs the XLA
    double-rate path: same math, no full-size float round-trip."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.csputils import CSP, Levels, Primaries, TRC
    from videorenderer_tpu.pipeline import (HDR10Metadata,
                                            make_deint_fields_fn,
                                            plan_pipeline)

    w, h = 64, 32
    src = SourceDescriptor(format=ColorFormat.P010, width=w, height=h,
                           matrix=CSP.BT_2020_NC, levels=Levels.TV,
                           primaries=Primaries.BT_2020, transfer=TRC.PQ,
                           interlaced=True, hdr10=HDR10Metadata())
    dst = OutputDescriptor(width=32, height=16, bits=8)
    plan = plan_pipeline(Settings(convert_to_sdr=True,
                                  upscaling=Upscaling.LANCZOS3), src, dst)

    rng = np.random.default_rng(0)
    mk = lambda s: (rng.integers(64, 941, (2, h, w), np.uint16) << 6,
                    rng.integers(64, 961, (2, h // 2, w // 2), np.uint16) << 6,
                    rng.integers(64, 961, (2, h // 2, w // 2), np.uint16) << 6)
    p, c, n = mk(0), mk(1), mk(2)

    ref_fn = make_deint_fields_fn(plan)
    r0, r1 = ref_fn(p, c, n)
    with pltpu.force_tpu_interpret_mode():
        k_fn = make_deint_fields_fn(plan, force_kernel=True)
        g0, g1 = k_fn(tuple(jnp.asarray(x) for x in p),
                      tuple(jnp.asarray(x) for x in c),
                      tuple(jnp.asarray(x) for x in n))
    assert g0.shape == r0.shape == (2, 3, 16, 32)
    # H-then-W vs W-then-H flips quantization-boundary codes by <= 1 LSB
    np.testing.assert_allclose(np.asarray(g0), np.asarray(r0),
                               atol=1.01 / 255.0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1),
                               atol=1.01 / 255.0)
    # quantized codes (8-bit grid): nearly all pixels identical
    same0 = np.mean(np.asarray(g0) == np.asarray(r0))
    assert same0 > 0.98, same0


def test_deint_kernel_packed_interpret():
    """Packed-surface output of the kernel deint path decodes to the planar
    result."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.csputils import CSP
    from videorenderer_tpu.pipeline import (make_deint_fields_fn,
                                            plan_pipeline)

    w, h = 64, 32
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709, interlaced=True)
    dst = OutputDescriptor(width=64, height=32, bits=8)
    plan = plan_pipeline(Settings(), src, dst)
    rng = np.random.default_rng(3)
    mk = lambda: (rng.integers(0, 256, (h, w), np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8))
    p, c, n = mk(), mk(), mk()
    with pltpu.force_tpu_interpret_mode():
        plain = make_deint_fields_fn(plan, force_kernel=True)
        f0, _ = plain(p, c, n)
        packed_fn = make_deint_fields_fn(plan, force_kernel=True,
                                         pack_surface=True)
        p0, _ = packed_fn(p, c, n)
    assert p0.dtype == jnp.int32 and p0.shape == (32, 64)
    d = np.asarray(p0).view(np.uint32)
    got = np.stack([(d >> s) & 0xFF for s in (0, 8, 16)], 0) / 255.0
    np.testing.assert_allclose(got, np.asarray(f0), atol=1e-7)


def test_deint_kernel_nondivisible_heights_interpret():
    """Plane heights not divisible by 16 (1080p chroma = 540) pad inside the
    kernel; the bottom-row bob clamp references the REAL last row."""
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.csputils import CSP
    from videorenderer_tpu.pipeline import (make_deint_fields_fn,
                                            plan_pipeline)

    w, h = 64, 40                      # chroma height 20: 20 % 16 != 0
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709, interlaced=True)
    dst = OutputDescriptor(width=32, height=24, bits=8)
    plan = plan_pipeline(Settings(use_dither=False), src, dst)
    rng = np.random.default_rng(5)
    mk = lambda: (rng.integers(0, 256, (h, w), np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8),
                  rng.integers(0, 256, (h // 2, w // 2), np.uint8))
    p, c, n = mk(), mk(), mk()
    r0, r1 = make_deint_fields_fn(plan)(p, c, n)
    with pltpu.force_tpu_interpret_mode():
        g0, g1 = make_deint_fields_fn(plan, force_kernel=True)(p, c, n)
    # H-then-W rounding flips isolated quantization-boundary codes by 1 LSB
    np.testing.assert_allclose(np.asarray(g0), np.asarray(r0),
                               atol=1.01 / 255.0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1),
                               atol=1.01 / 255.0)
    assert (np.asarray(g0) == np.asarray(r0)).mean() > 0.99


def test_banded_mid16_intermediate_interpret():
    """Compact int16 W-pass intermediates: quantization is exactly
    round(x * MID16_SCALE) and a rows3 consume with the 1/MID16_SCALE
    unscale folded into the H weights lands within the 2^-14 fixed-point
    band of the f32-intermediate path."""
    mx = scale.upscale_matrix(Upscaling.LANCZOS3, 256, 128)
    rng = np.random.default_rng(13)
    x = (rng.integers(0, 1024, (40, 256), dtype=np.uint16) << 6)
    with pltpu.force_tpu_interpret_mode():
        f32 = np.asarray(rp.banded_resize_last_axis(
            jnp.asarray(x), np.asarray(mx), pre_scale=1 / 65535.0))
        q = np.asarray(rp.banded_resize_last_axis(
            jnp.asarray(x), np.asarray(mx), pre_scale=1 / 65535.0,
            mid16=True))
    assert q.dtype == np.int16
    np.testing.assert_array_equal(q, np.round(f32 * rp.MID16_SCALE))

    # rows3 consume: int16 planes + unscale vs f32 planes, same epilogue
    my = scale.upscale_matrix(Upscaling.CATMULL_ROM, 40, 64)
    m = np.asarray([[1.0, 0.0, 1.4], [1.0, -0.2, -0.7], [1.0, 1.8, 0.0]],
                   np.float32)

    def epi(yt, ut, vt):
        rgb = jnp.stack([m[i, 0] * yt + m[i, 1] * ut + m[i, 2] * vt
                         for i in range(3)], axis=0)
        return jnp.clip(rgb, 0.0, 1.0)

    yq, uq, vq = (jnp.asarray(q).reshape(1, 40, 128),) * 3
    yf, uf, vf = (jnp.asarray(f32).reshape(1, 40, 128),) * 3
    myf = np.asarray(my, np.float32)
    with pltpu.force_tpu_interpret_mode():
        got_q = np.asarray(rp.rows3_tail(
            yq, uq, vq, myf, myf, 64, epi,
            y_scale=1.0 / rp.MID16_SCALE, c_scale=1.0 / rp.MID16_SCALE))
        got_f = np.asarray(rp.rows3_tail(yf, uf, vf, myf, myf, 64, epi))
    # fixed-point band: |err| <= q/2 * L1(H row) * L1(cmat row) ~ 3e-4
    np.testing.assert_allclose(got_q, got_f, atol=3e-4)
