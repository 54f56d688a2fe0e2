"""Pipeline builder: config -> jit-compiled frame-processing function.

This is the TPU analogue of the reference's pipeline assembly:

 * media-type negotiation and path selection
   (CDX11VideoProcessor::InitMediaType, Source/DX11VideoProcessor.cpp:1742-1959)
 * runtime HLSL codegen specialization
   (GetShaderConvertColor, Source/Shaders.cpp:593-930)
 * render-pass orchestration
   (CDX11VideoProcessor::Process, Source/DX11VideoProcessor.cpp:3297-3436)

Where the reference generates HLSL text and calls D3DCompile, we compose
pure jnp functions and let XLA trace/compile them — tracing *is* the
codegen.  A (Settings, SourceDescriptor, OutputDescriptor) triple fully
determines the computation; all matrices/weights are baked as constants.

Stage order follows the reference's two backends:
 * ``vp_scaling=True`` (default; the "D3D11VP" order): convert color at
   source res (matrix only) -> resize -> post-scale corrections
   (HLG->PQ / HDR->SDR / BT.2020 fix) -> local tone-map -> dither.
 * ``vp_scaling=False`` (the "shader path" order): convert + corrections at
   source resolution (Source/Shaders.cpp:861-923 are appended to the convert
   shader) -> resize -> local tone-map -> dither.

Unlike the reference's fixconvert_* shaders we never need the
"fix incorrect BT.2020 YCbCr" matrix (ps_fix_bt2020.hlsl) in the VP order:
our convert stage always uses the correct matrix (the fix exists only
because the Windows fixed-function VP lacks BT.2020 support).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass


import jax
import jax.numpy as jnp
import numpy as np

from . import csputils
from .config import Settings, TexFormat, Upscaling
from .csputils import (CSP, ChromaLocation, Colorspace, CSPParams, Levels,
                       Primaries, TRC)
from .formats import ColorFormat, ColorSystem, FormatInfo, get_format_info
from .ops import chroma as chroma_ops
from .ops import dither as dither_ops
from .ops import scale as scale_ops
from .ops import tonemap as tonemap_ops
from .ops import transfer as transfer_ops


@dataclass(frozen=True)
class HDR10Metadata:
    """HDR10 static metadata carried as media side data
    (MediaSideDataHDR / ...ContentLightLevel, consumed in
    Source/DX11VideoProcessor.cpp:2232-2267)."""

    mastering_min_nits: float = 0.005
    mastering_max_nits: float = 1000.0
    max_cll: float = 1000.0
    max_fall: float = 400.0


@dataclass(frozen=True)
class SourceDescriptor:
    """Media type + DXVA2 extended-format analogue (what InitMediaType
    parses from VIDEOINFOHEADER2, Source/DX11VideoProcessor.cpp:1757-1821)."""

    format: ColorFormat
    width: int
    height: int
    matrix: CSP = CSP.AUTO
    levels: Levels = Levels.AUTO
    primaries: Primaries = Primaries.AUTO
    transfer: TRC = TRC.AUTO
    chroma_location: ChromaLocation = ChromaLocation.UNKNOWN
    interlaced: bool = False
    # field order for interlaced content (AM_VIDEO_FLAG_FIELD1FIRST,
    # Source/DX11VideoProcessor.cpp:2216-2222); ignored when progressive
    top_field_first: bool = True
    hdr10: HDR10Metadata | None = None
    # Dolby Vision mapping + color metadata (MediaSideDataDOVIMetadata) and
    # the L2 trim block; presence switches the convert stage to the DoVi
    # chain (reshape -> RPU ycc matrix -> PQ/LMS round trip,
    # Source/DX11VideoProcessor.cpp:2276-2537, Source/Shaders.cpp:531-859).
    dovi: "object | None" = None            # ops.dovi.DoviMetadata
    dovi_trims: "object | None" = None      # ops.tonemap.DoviTrims
    # ST 2094-10 extension blocks (L1/L2/L3/L6 + ColorMetadata luminance,
    # ops.dovi_ext.DoviExtensions): resolved at plan time into tone-map
    # params / trims / output HDR10 metadata exactly as CopySample does
    # (Source/DX11VideoProcessor.cpp:2357-2500)
    dovi_ext: "object | None" = None
    # HDR10+ / ST 2094-40 dynamic metadata (MediaSideDataHDR10Plus,
    # Include/IMediaSideData.h:67-130 — struct-only in the reference; here
    # the scene statistics feed the tone map like DoVi L1 does,
    # ops.hdr10plus.HDR10PlusMetadata)
    hdr10plus: "object | None" = None
    # source crop rectangle (left, top, right, bottom) — the IBasicVideo
    # SetSourcePosition analogue; None = full frame
    src_rect: tuple[int, int, int, int] | None = None
    # ProcAmp (IMFVideoProcessor, Source/VideoProcessor.cpp:334-403);
    # brightness here is the reference's DXVA2 fixed-point value already
    # divided by 255 (SetShaderConvertColorParams, DX11VideoProcessor.cpp:839)
    brightness: float = 0.0   # -1..1
    contrast: float = 1.0
    hue_deg: float = 0.0
    saturation: float = 1.0

    def specified(self) -> "SourceDescriptor":
        """Apply SpecifyExtendedFormat defaulting (Source/Helper.cpp:1169-1212)
        + set_colorspace mapping (Source/Helper.cpp:949-1004)."""
        info = get_format_info(self.format)
        d = self
        if info.cs_type == ColorSystem.RGB:
            return dataclasses.replace(
                d, matrix=CSP.RGB, levels=Levels.PC,
                primaries=(d.primaries if d.primaries != Primaries.AUTO
                           else Primaries.BT_709),
                transfer=(d.transfer if d.transfer != TRC.AUTO else TRC.SRGB),
                chroma_location=ChromaLocation.UNKNOWN)
        chroma_loc = self.chroma_location
        if info.subsampling != 420:
            chroma_loc = ChromaLocation.UNKNOWN
        elif chroma_loc == ChromaLocation.UNKNOWN:
            chroma_loc = ChromaLocation.MPEG2
        levels = d.levels if d.levels != Levels.AUTO else Levels.TV
        matrix = d.matrix
        if matrix == CSP.AUTO:
            matrix = csputils.default_matrix_for_size(d.width, d.height)
        primaries = d.primaries if d.primaries != Primaries.AUTO else Primaries.BT_709
        transfer = d.transfer if d.transfer != TRC.AUTO else TRC.BT_1886
        return dataclasses.replace(
            d, matrix=matrix, levels=levels, primaries=primaries,
            transfer=transfer, chroma_location=chroma_loc)

    @property
    def is_hdr(self) -> bool:
        return self.transfer in (TRC.PQ, TRC.HLG)


@dataclass(frozen=True)
class OutputDescriptor:
    """Target surface description (swap-chain analogue)."""

    width: int
    height: int
    bits: int = 8            # quantization depth: 8 / 10; 16 = float16 out
    hdr: bool = False        # True: PQ/BT.2020 output (HDR passthrough)
    # video placement within the surface (IBasicVideo SetDestinationPosition
    # analogue): the scaled video lands in video_rect (l, t, r, b) and the
    # rest is filled black (FillBlack, Source/VideoProcessor.h:171-236).
    video_rect: tuple[int, int, int, int] | None = None

    @property
    def video_size(self) -> tuple[int, int]:
        if self.video_rect is None:
            return self.width, self.height
        l, t, r, b = self.video_rect
        return r - l, b - t


@dataclass(frozen=True)
class PipelinePlan:
    """Resolved static plan — everything the traced function needs."""

    settings: Settings
    src: SourceDescriptor
    dst: OutputDescriptor
    info: FormatInfo
    cmat_m: np.ndarray     # (3,3)
    cmat_c: np.ndarray     # (3,)
    apply_matrix: bool
    # correction stages (post-scale in VP order / in-convert in shader order)
    convert_to_sdr: bool       # PQ or HLG -> SDR (Hable + 2020->709 + gamma)
    hlg_to_pq: bool            # HDR passthrough of HLG source
    fix_bt2020_sdr: bool       # SDR BT.2020 primaries -> 709 display
    sdr_gamma: float           # source power gamma for fix_bt2020_sdr
    local_tonemap: bool
    dither_bits: int | None
    dovi: "object | None" = None        # ops.dovi.DoviMetadata
    dovi_trims: "object | None" = None  # ops.tonemap.DoviTrims
    dovi_ext: "object | None" = None    # ops.dovi_ext.DoviExtensions
    src_rect: tuple[int, int, int, int] | None = None
    # resolved local-tone-map parameters + (possibly L1-upgraded) operator
    tonemap_params: "object | None" = None   # ops.tonemap.HDRParams
    tonemap_type: int = 0
    # static ST 2094-40 window when tonemap_type == 7 (HDR10+ guided curve:
    # knee/anchors are plan structure, like the DoVi reshape curves)
    hdr10plus_window: "object | None" = None
    # output-side HDR10 static metadata (swap-chain SetHDRMetaData analogue,
    # Source/DX11VideoProcessor.cpp:2629-2739) — what a sink should program
    output_hdr10: HDR10Metadata | None = None


def _build_cmat(src: SourceDescriptor, info: FormatInfo) -> tuple[np.ndarray, np.ndarray, bool]:
    """Color matrix exactly as SetShaderConvertColorParams
    (Source/DX11VideoProcessor.cpp:813-890)."""
    params = CSPParams(
        color=Colorspace(space=src.matrix, levels=src.levels,
                         primaries=src.primaries, gamma=src.transfer),
        brightness=src.brightness,
        contrast=src.contrast,
        hue=src.hue_deg / 180.0 * np.pi,
        saturation=src.saturation,
        gray=info.cs_type == ColorSystem.GRAY,
        input_bits=info.depth,
        texture_bits=info.depth,
    )
    cm = csputils.get_csp_matrix(params)
    enable = (
        info.cs_type == ColorSystem.YUV
        or info.cformat in (ColorFormat.GBRP8, ColorFormat.GBRP10, ColorFormat.GBRP16)
        or params.gray
        or abs(params.brightness) > 1e-4
        or abs(params.contrast - 1.0) > 1e-4
    )
    return cm.m, cm.c, enable


def plan_pipeline(settings: Settings, src: SourceDescriptor,
                  dst: OutputDescriptor) -> PipelinePlan:
    """Static planning — the InitMediaType analogue."""
    src = src.specified()
    info = get_format_info(src.format)
    # DoVi engages whenever RPU metadata is present (the reference validates
    # it in CVideoProcessor::CheckDoviMetadata and then always prefers the
    # RPU pipeline; bHdrPreferDoVi only orders DoVi vs HDR10 profile 7/8
    # negotiation, which the caller resolves before handing us metadata).
    dovi = src.dovi
    if dovi is not None:
        # DoVi replaces the standard matrix with the RPU's ycc_to_rgb
        # (Source/DX11VideoProcessor.cpp:817-836)
        from .ops.dovi import build_ycc_to_rgb_cmat
        m, c = build_ycc_to_rgb_cmat(dovi, brightness=src.brightness,
                                     contrast=src.contrast)
        apply_matrix = True
    else:
        m, c, apply_matrix = _build_cmat(src, info)

    is_pq = src.transfer == TRC.PQ
    is_hlg = src.transfer == TRC.HLG and dovi is None
    bt2020 = src.primaries == Primaries.BT_2020

    dovi_trims = src.dovi_trims
    dovi_ext = src.dovi_ext
    if dovi_ext is not None and dovi_trims is None:
        from .ops import dovi_ext as dovi_ext_ops
        dovi_trims = dovi_ext_ops.select_l2_trims(
            dovi_ext, float(settings.hdr_display_max_nits))

    convert_to_sdr = (not dst.hdr) and settings.convert_to_sdr and (
        is_pq or is_hlg or dovi is not None)
    hlg_to_pq = dst.hdr and settings.hdr_passthrough and is_hlg
    # SDR source with BT.2020 primaries shown on a 709 display
    # (ps_fix_bt2020.hlsl; codegen branch Source/Shaders.cpp:892-915)
    fix_bt2020_sdr = bt2020 and not (is_pq or is_hlg) and not dst.hdr
    sdr_gamma = {
        TRC.LINEAR: 1.0, TRC.GAMMA18: 1.8, TRC.GAMMA20: 2.0,
        TRC.GAMMA26: 2.6, TRC.GAMMA28: 2.8,
    }.get(src.transfer, 2.2)
    local_tonemap = (dst.hdr and settings.hdr_local_tone_mapping
                     and (is_pq or is_hlg or dovi is not None))

    # resolve the tone-map parameter block once: L1 (+L3) extensions feed
    # min/max/maxCLL=max/maxFALL=avg and upgrade type 5 -> 6; otherwise the
    # (DoVi-merged) HDR10 mastering metadata applies
    # (Source/DX11VideoProcessor.cpp:2728-2736)
    tm_type = int(settings.hdr_local_tone_mapping_type)
    output_hdr10 = src.hdr10 if dst.hdr else None
    h10p_window = None
    if dovi_ext is not None:
        from .ops import dovi_ext as dovi_ext_ops
        tm_params, tm_type = dovi_ext_ops.hdr_params_from_extensions(
            dovi_ext, src.hdr10, float(settings.hdr_display_max_nits),
            tm_type)
        if dst.hdr:
            output_hdr10 = dovi_ext_ops.merge_hdr10(src.hdr10, dovi_ext)
    elif src.hdr10plus is not None:
        from .ops import hdr10plus as h10p_ops
        tm_params, tm_type = h10p_ops.hdr_params_from_hdr10plus(
            src.hdr10plus, src.hdr10, float(settings.hdr_display_max_nits),
            tm_type)
        if tm_type == 7:
            h10p_window = src.hdr10plus.windows[0]
        if dst.hdr:
            output_hdr10 = h10p_ops.merge_hdr10(src.hdr10, src.hdr10plus)
    else:
        h = src.hdr10 or HDR10Metadata()
        tm_params = tonemap_ops.HDRParams(
            mastering_min_nits=h.mastering_min_nits,
            mastering_max_nits=h.mastering_max_nits,
            max_cll=h.max_cll, max_fall=h.max_fall,
            display_max_nits=float(settings.hdr_display_max_nits))

    if src.src_rect is not None and info.cs_type == ColorSystem.YUV:
        dw, dh = info.chroma_div
        l, t, r, b = src.src_rect
        if l % dw or r % dw or t % dh or b % dh:
            raise ValueError(
                f"src_rect {src.src_rect} must align to the {info.name} "
                f"chroma grid ({dw}x{dh})")

    # positive: ordered dither to that depth; negative: plain rounding;
    # 0: float output, no quantization (TEXFMT_16FLOAT analogue)
    if dst.bits in (8, 10):
        dither_bits = dst.bits if settings.use_dither else -dst.bits
    else:
        dither_bits = 0

    return PipelinePlan(
        settings=settings, src=src, dst=dst, info=info,
        cmat_m=m, cmat_c=c, apply_matrix=apply_matrix,
        convert_to_sdr=convert_to_sdr, hlg_to_pq=hlg_to_pq,
        fix_bt2020_sdr=fix_bt2020_sdr, sdr_gamma=sdr_gamma,
        local_tonemap=local_tonemap, dither_bits=dither_bits,
        dovi=dovi, dovi_trims=dovi_trims, dovi_ext=dovi_ext,
        src_rect=src.src_rect, tonemap_params=tm_params,
        tonemap_type=tm_type, output_hdr10=output_hdr10,
        hdr10plus_window=h10p_window,
    )


@dataclass(frozen=True)
class OutputSignalInfo:
    """What the output pixels *are* — the swap-chain colorspace + HDR10
    metadata the reference programs every present
    (SetColorSpace1/SetHDRMetaData, Source/DX11VideoProcessor.cpp:2629-2739).
    Sinks persist this next to the pixels so a downstream consumer can
    display them correctly."""

    width: int
    height: int
    bits: int
    primaries: str        # Primaries name
    transfer: str         # TRC name ("PQ" for HDR out)
    matrix: str = "RGB"
    range: str = "full"
    hdr10: HDR10Metadata | None = None

    def to_dict(self) -> dict:
        d = {"width": self.width, "height": self.height, "bits": self.bits,
             "primaries": self.primaries, "transfer": self.transfer,
             "matrix": self.matrix, "range": self.range}
        if self.hdr10 is not None:
            d["hdr10"] = {
                "mastering_min_nits": self.hdr10.mastering_min_nits,
                "mastering_max_nits": self.hdr10.mastering_max_nits,
                "max_cll": self.hdr10.max_cll,
                "max_fall": self.hdr10.max_fall,
            }
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "OutputSignalInfo":
        h = d.get("hdr10")
        return cls(width=d["width"], height=d["height"], bits=d["bits"],
                   primaries=d["primaries"], transfer=d["transfer"],
                   matrix=d.get("matrix", "RGB"),
                   range=d.get("range", "full"),
                   hdr10=HDR10Metadata(**h) if h else None)


def output_signal_info(plan: PipelinePlan) -> OutputSignalInfo:
    """Resolve the output colorspace/transfer + HDR10 metadata from the plan:

     * HDR out: RGB full G2084 P2020 (the reference's fixed HDR swap-chain
       colorspace) + the (DoVi-merged) mastering/CLL metadata;
     * tone-mapped / BT.2020-fixed SDR: sRGB-like gamma in BT.709;
     * plain SDR: the source transfer/primaries pass through (the pipeline
       only applies the matrix + resize).
    """
    dst = plan.dst
    if dst.hdr:
        return OutputSignalInfo(
            width=dst.width, height=dst.height, bits=dst.bits,
            primaries=Primaries.BT_2020.name, transfer=TRC.PQ.name,
            hdr10=plan.output_hdr10 or HDR10Metadata())
    if plan.convert_to_sdr or plan.fix_bt2020_sdr:
        return OutputSignalInfo(
            width=dst.width, height=dst.height, bits=dst.bits,
            primaries=Primaries.BT_709.name, transfer=TRC.SRGB.name)
    return OutputSignalInfo(
        width=dst.width, height=dst.height, bits=dst.bits,
        primaries=plan.src.primaries.name, transfer=plan.src.transfer.name)


# ---------------------------------------------------------------------------
# traced stages — all take/return (..., 3, H, W) float arrays
# ---------------------------------------------------------------------------


def _normalize_planes(plan: PipelinePlan, planes, dtype) -> list[jnp.ndarray]:
    scale = 1.0 / (2.0 ** plan.info.plane_bits - 1.0)
    return [p.astype(dtype) * jnp.asarray(scale, dtype) for p in planes]


def _crop_planes(plan: PipelinePlan, planes):
    """Source-rect crop (IBasicVideo SetSourcePosition analogue): static
    slices per plane, chroma rect divided by the subsampling factors."""
    rect = plan.src_rect
    if rect is None:
        return planes
    l, t, r, b = rect
    dw, dh = plan.info.chroma_div
    out = []
    for i, p in enumerate(planes):
        if i == 0 or plan.info.cs_type != ColorSystem.YUV:
            out.append(p[..., t:b, l:r])
        else:
            out.append(p[..., t // dh:b // dh, l // dw:r // dw])
    return tuple(out)


def _convert_color(plan: PipelinePlan, planes: tuple[jnp.ndarray, ...],
                   dtype=jnp.float32, rt_curves: dict | None = None,
                   rt_cmat: dict | None = None) -> jnp.ndarray:
    """ConvertColorPass analogue: normalize, chroma upsample, 3x3 matrix.
    Returns (..., 3, H, W)."""
    info = plan.info
    s = plan.settings
    norm = _normalize_planes(plan, _crop_planes(plan, planes), dtype)

    if info.cs_type == ColorSystem.GRAY:
        y = norm[0]
        m, c = plan.cmat_m, plan.cmat_c
        rgb = jnp.stack([y * m[i, 0] + c[i] for i in range(3)], axis=-3)
        return rgb

    if info.cs_type == ColorSystem.YUV:
        y, u, v = norm
        if s.deint_blend and plan.src.interlaced and info.subsampling == 420:
            y = chroma_ops.blend_deinterlace_luma(y)
        uv = jnp.stack([u, v], axis=-3)
        uv = chroma_ops.upsample_chroma(
            uv, info.subsampling, s.chroma_scaling, plan.src.chroma_location)
        comps = jnp.concatenate([y[..., None, :, :], uv], axis=-3)
    else:
        comps = jnp.stack(norm, axis=-3)

    if plan.dovi is not None:
        # DoVi reshape on the raw ycc signal before the matrix
        # (ShaderGetPixels -> ShaderDoviReshape, Source/Shaders.cpp:809-817)
        from .ops import dovi as dovi_ops
        if rt_curves is not None:
            comps = dovi_ops.reshape_dynamic(
                comps, rt_curves, axis=-3,
                structure=dovi_ops.curve_structure(plan.dovi))
        else:
            comps = dovi_ops.reshape(comps, plan.dovi, axis=-3)

    if plan.apply_matrix:
        if rt_cmat is not None:
            # runtime ProcAmp path: matrix as traced tensors (the reference
            # updates the cbuffer per IMFVideoProcessor ProcAmp change)
            m = jnp.asarray(rt_cmat["m"], dtype)
            c = jnp.asarray(rt_cmat["c"], dtype)
        else:
            m = jnp.asarray(plan.cmat_m, dtype)
            c = jnp.asarray(plan.cmat_c, dtype)
        # per-pixel 3-vector FMA on the VPU (cm_r/cm_g/cm_b/cm_c cbuffer,
        # Source/Shaders.cpp:819-820)
        yc = comps[..., 0, :, :]
        uc = comps[..., 1, :, :]
        vc = comps[..., 2, :, :]
        rgb = jnp.stack([m[i, 0] * yc + m[i, 1] * uc + m[i, 2] * vc + c[i]
                         for i in range(3)], axis=-3)
    else:
        rgb = comps

    if plan.dovi is not None:
        # PQ EOTF -> (LMS2RGB @ rgb_to_lms) -> PQ OETF
        # (Source/Shaders.cpp:824-859)
        from .ops import dovi as dovi_ops
        rgb = dovi_ops.apply_lms_matrix(rgb, plan.dovi, axis=-3)
    return rgb


def _corrections(plan: PipelinePlan, rgb: jnp.ndarray,
                 trims=None) -> jnp.ndarray:
    """Post-scale correction shaders (selection in InitMediaType,
    Source/DX11VideoProcessor.cpp:1896-1930)."""
    s = plan.settings
    axis = -3
    if trims is None:
        trims = plan.dovi_trims
    if plan.convert_to_sdr:
        # ps_convert_pq_to_sdr.hlsl / HLG variant: -> linear(SDR-relative) ->
        # Hable -> 2020->709 -> sRGB-ish gamma
        luminance_scale = 10000.0 / s.sdr_display_nits  # SetShaderLuminanceParams
        x = jnp.clip(rgb, 0.0, 1.0)
        if plan.src.transfer == TRC.HLG and plan.dovi is None:
            # the reference runs HLGtoLinear -> LinearToST2084(1000) in one
            # pass, clips, then ST2084ToLinear(ls) in the next
            # (ps_convert_hlg_to_sdr.hlsl) because the two shader passes
            # can't fuse; the PQ round trip is algebraically
            # clip(x/1000, 0, 1) * ls — 12 vector pows/pixel fold away.
            # (DoVi L2 trims can't intervene here: that branch requires
            # plan.dovi, and DoVi sources never take the HLG branch.)
            x = transfer_ops.hlg_to_linear(x, axis=axis)
            x = jnp.clip(x * (1.0 / 1000.0), 0.0, 1.0) * luminance_scale
        else:
            if plan.dovi is not None and plan.dovi_trims is not None \
                    and plan.dovi_trims.l2_enabled:
                # L2 trims on the PQ signal (Source/Shaders.cpp:873-877)
                x = tonemap_ops.dolby_vision_trims(x, trims, axis=axis,
                                                   pq_input=True)
            x = transfer_ops.st2084_to_linear(x, luminance_scale)
        x = tonemap_ops.tonemap_hable_sdr(x)
        x = _gamut_2020_to_709(x, axis)
        return transfer_ops.linear_to_srgb_like(x)
    if plan.hlg_to_pq:
        # ps_convert_hlg_to_pq.hlsl
        x = jnp.clip(rgb, 0.0, 1.0)
        x = transfer_ops.hlg_to_linear(x, axis=axis)
        return transfer_ops.linear_to_st2084(x, 1000.0)
    if plan.fix_bt2020_sdr:
        # SDR BT.2020 -> 709 (codegen branch, Source/Shaders.cpp:892-915)
        x = transfer_ops.srgb_like_to_linear(rgb, plan.sdr_gamma)
        x = _gamut_2020_to_709(x, -3)
        return transfer_ops.linear_to_srgb_like(x)
    return rgb


def _gamut_2020_to_709(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """3x3 gamut matrix unrolled to scalar FMAs (scalar constants inline
    into traced kernels; array constants may not be captured by Pallas)."""
    gm = csputils.bt2020_to_bt709_matrix()
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    return jnp.stack(
        [float(gm[i, 0]) * r + float(gm[i, 1]) * g + float(gm[i, 2]) * b
         for i in range(3)], axis=axis)


def _local_tonemap(plan: PipelinePlan, rgb: jnp.ndarray,
                   trims=None) -> jnp.ndarray:
    return tonemap_ops.local_tonemap_pq(
        rgb, plan.tonemap_type, plan.tonemap_params,
        trims=trims if trims is not None else plan.dovi_trims, axis=-3,
        window=plan.hdr10plus_window)


def _resolve_rt_trims(plan: PipelinePlan, rt: dict | None):
    """Serving-mode L2 trims: rt["l2_trims"] scalars override the plan's
    static DoviTrims (the stage must exist statically — plan with l2-enabled
    trims — for per-scene values to flow in without retracing, the way the
    reference re-uploads the DoVi dynamic cbuffer per sample,
    Source/DX11VideoProcessor.cpp:954-983)."""
    tr = rt.get("l2_trims") if rt else None
    if tr is None:
        return plan.dovi_trims
    return tonemap_ops.DoviTrims(
        chroma_weight=tr["chroma_weight"],
        saturation_gain=tr["saturation_gain"],
        trim_slope=tr["trim_slope"], trim_offset=tr["trim_offset"],
        trim_power=tr["trim_power"], l2_enabled=True)


def _final_pass(plan: PipelinePlan, rgb: jnp.ndarray,
                row_offset: "int | jnp.ndarray" = 0) -> jnp.ndarray:
    """ps_final_pass.hlsl: ordered dither + quantization, then placement of
    the video rect into the target surface with black fill (FillBlack).

    ``row_offset``: global row of local row 0 (row-sharded execution) so the
    dither pattern keeps its unsharded phase."""
    db = plan.dither_bits
    if db is not None and db != 0:
        if db < 0:
            rgb = dither_ops.quantize(jnp.clip(rgb, 0.0, 1.0), -db)
        else:
            rgb = dither_ops.ordered_dither(jnp.clip(rgb, 0.0, 1.0), db,
                                            row_offset=row_offset)
    rect = plan.dst.video_rect
    if rect is not None:
        l, t, r, b = rect
        surface = jnp.zeros(rgb.shape[:-2] + (plan.dst.height, plan.dst.width),
                            rgb.dtype)
        rgb = surface.at[..., t:b, l:r].set(rgb)
    return rgb


def surface_pack_format(dst: OutputDescriptor) -> str:
    """The packed-dword surface format for this output depth — the
    swap-chain backbuffer the reference presents into (8-bit flip chains
    use RGBA8, HDR/10-bit chains DXGI_FORMAT_R10G10B10A2_UNORM,
    Source/DX11VideoProcessor.cpp:1490-1530)."""
    if dst.bits == 10:
        return "rgb10a2"
    if dst.bits == 8:
        return "rgba8"
    raise ValueError("packed surface output needs an 8- or 10-bit "
                     f"OutputDescriptor, got bits={dst.bits}")


def _pack_surface_xla(rgb: jnp.ndarray, fmt: str) -> jnp.ndarray:
    """XLA-path packer: (..., 3, H, W) float [0,1] -> (..., H, W) int32
    dwords (same math as kernels.resize_pallas.pack_surface_tiles)."""
    r = rgb[..., 0, :, :]
    g = rgb[..., 1, :, :]
    b = rgb[..., 2, :, :]
    if fmt == "rgb10a2":
        q = lambda x: (jnp.clip(x, 0.0, 1.0) * 1023.0 + 0.5).astype(jnp.int32)
        return q(r) | (q(g) << 10) | (q(b) << 20) | jnp.int32(-1073741824)
    if fmt == "rgba8":
        q = lambda x: (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.int32)
        return q(r) | (q(g) << 8) | (q(b) << 16) | jnp.int32(-16777216)
    raise ValueError(fmt)


def _vp_format_allowed(s: Settings, info: FormatInfo) -> bool:
    """VP format allowlist (VPEnableFormats_t, IVideoRenderer.h:97-102):
    which source classes may use the fixed-function-style accelerated path;
    others fall back to the XLA composition (the reference's shader path)."""
    f = info.cformat
    if f == ColorFormat.NV12:
        return s.vp_formats.nv12
    if f in (ColorFormat.P010, ColorFormat.P016):
        return s.vp_formats.p01x
    if f == ColorFormat.YUY2:
        return s.vp_formats.yuy2
    return s.vp_formats.other


def _separable_geometry(plan: PipelinePlan) -> bool:
    """True when every resize pass is a separable axis matrix (Jinc2's 2D
    one-pass shader is the only non-separable case)."""
    s = plan.settings
    src, dst = plan.src, plan.dst
    h, w = src.height, src.width
    if plan.src_rect is not None:
        l, t, r, b = plan.src_rect
        w, h = r - l, b - t
    dw, dh = dst.video_size
    if s.upscaling == Upscaling.JINC2:
        rx, ry = scale_ops.jinc2_passes(h, w, dh, dw, s.interpolate_at_50pct)
        if "up" in (rx, ry):
            return False
    return True


def _can_fuse(plan: PipelinePlan) -> bool:
    """The fused linear-resample path applies when everything between plane
    normalization and the first nonlinearity is linear: chroma upsample,
    (blend deinterlace), color matrix, separable resize.  That is the
    VP-order pipeline with a separable scaler; Jinc2 (non-separable 2D) and
    the shader-order (corrections before resize) fall back.  DoVi plans take
    the split-fused path instead (:func:`_can_split_fuse`) — the reshape is
    nonlinear in the ycc signal, so the resample can't cross it."""
    s = plan.settings
    if not s.vp_scaling:
        return False
    if plan.dovi is not None:
        return False
    return _separable_geometry(plan)


def _can_split_fuse(plan: PipelinePlan) -> bool:
    """DoVi variant of the fused path: the linear prefix splits at the
    reshape — integer-in banded kernels upsample chroma to *source*
    resolution, the reshape/matrix/LMS chain runs there (as the reference's
    convert pass does), and the banded kernels resize the RGB to output
    resolution.  Requires the VP-order pipeline, separable scalers, and a
    planar-YUV source (DoVi RPUs describe ycc signals)."""
    s = plan.settings
    return (s.vp_scaling and plan.dovi is not None
            and plan.info.cs_type == ColorSystem.YUV
            and _separable_geometry(plan))


def _fused_apply2d(x_raw, mx, my, use_pallas: bool, norm: float | None,
                   dtype):
    """Apply optional (in,out) matrices along W then H to a plane — raw
    integer input when ``norm`` is set (the UNORM normalization folds into
    the first matmul's weights on the Pallas path so integer data streams
    straight from HBM), or already-float input with ``norm=None``."""
    from .kernels import resize_pallas as rp

    # Note: a shifted-FMA "stencil" form for narrow diagonal bands
    # (ops/scale.band_diagonals) was benchmarked here and LOST to the banded
    # MXU kernel (658 vs 891 f/s on the headline chain) — XLA re-reads the
    # full plane per tap; the kernel streams the stripe once.
    if use_pallas:
        if mx is not None:
            x = rp.banded_resize_last_axis(x_raw, np.asarray(mx, np.float32),
                                           pre_scale=norm)
            if my is not None:
                x = rp.banded_resize_rows(x, np.asarray(my, np.float32))
            return x
        if my is not None:
            return rp.banded_resize_rows(x_raw, np.asarray(my, np.float32),
                                         pre_scale=norm)
        if norm is None:
            return x_raw
        return x_raw.astype(dtype) * jnp.asarray(norm, dtype)

    x = x_raw if norm is None else (x_raw.astype(dtype)
                                    * jnp.asarray(norm, dtype))
    if mx is not None:
        x = scale_ops.resize_axis(x, mx, -1)
    if my is not None:
        x = scale_ops.resize_axis(x, my, -2)
    return x


def _compose(a: np.ndarray | None, b: np.ndarray | None):
    """Compose two (in,out) axis maps applied a-then-b."""
    if a is None:
        return b
    if b is None:
        return a
    return a @ b


def _make_tail_epilogue(plan: PipelinePlan, dtype=jnp.float32,
                        with_cmat: bool = True):
    """Tail of the fused pipeline as a closure over (y, u, v) component
    tiles — color matrix, corrections, local tone map and dither — for
    execution *inside* the rows3 kernel (kernels/resize_pallas.rows3_tail).
    Tiles are (128, tile_w) with tile origins ≡ 0 (mod 32), so the ordered
    dither needs no phase offset.  ``with_cmat=False``: the three tiles are
    already R,G,B (DoVi stage B)."""
    m = np.asarray(plan.cmat_m, np.float32)
    c = np.asarray(plan.cmat_c, np.float32)

    def epi(y, u, v):
        if with_cmat and plan.apply_matrix:
            rgb = jnp.stack([m[i, 0] * y + m[i, 1] * u + m[i, 2] * v + c[i]
                             for i in range(3)], axis=0)
        else:
            rgb = jnp.stack([y, u, v], axis=0)
        return _tail_common(plan, rgb)

    return epi


def _tail_common(plan: PipelinePlan, rgb: jnp.ndarray,
                 trims=None, hdr=None, hdr_sc=None) -> jnp.ndarray:
    rgb = _corrections(plan, rgb, trims=trims)
    if plan.local_tonemap:
        if hdr_sc is not None:
            # kernel path: derived scalars via SMEM (scalar transcendentals
            # are not legal inside Mosaic kernels — precomputed outside)
            rgb = tonemap_ops.local_tonemap_pq_from_scalars(
                rgb, plan.tonemap_type, hdr_sc, trims=trims, axis=-3,
                window=plan.hdr10plus_window)
        elif hdr is not None:
            rgb = tonemap_ops.local_tonemap_pq_rt(
                rgb, plan.tonemap_type, hdr, trims=trims, axis=-3,
                window=plan.hdr10plus_window)
        else:
            rgb = _local_tonemap(plan, rgb, trims=trims)
    db = plan.dither_bits
    if db is not None and db != 0:
        if db < 0:
            rgb = dither_ops.quantize(jnp.clip(rgb, 0.0, 1.0), -db)
        else:
            rgb = dither_ops.ordered_dither_iota(jnp.clip(rgb, 0.0, 1.0), db)
    return rgb


_RT_HDR_KEYS = ("mastering_min_nits", "mastering_max_nits", "max_cll",
                "max_fall", "display_max_nits")
_RT_TRIM_KEYS = ("chroma_weight", "saturation_gain", "trim_slope",
                 "trim_offset", "trim_power")


def _rt_layout(plan: PipelinePlan, with_cmat: bool = True) -> list:
    """SMEM scalar-vector layout for serving-mode runtime parameters on the
    fused-tail kernel: which cbuffer-style segments this plan's tail reads.
    Segment presence is static (the stage must exist in the plan); values
    re-upload per call without retracing — the analogue of the reference's
    per-sample constant-buffer updates (Source/DX11VideoProcessor.cpp:839-890
    for the color matrix, :954-983 for the DoVi dynamic cbuffer).

    ``with_cmat=False``: the color matrix is applied upstream of the tail
    (the DoVi split-fused pipeline consumes it in stage A)."""
    lay = []
    if with_cmat and plan.apply_matrix:
        lay.append(("cmat", 12))      # row-major 3x(m0 m1 m2 c)
    if plan.local_tonemap:
        lay.append(("hdr", 5))        # derived tone-map scalars
                                      # (tonemap.local_tonemap_rt_scalars)
    if plan.dovi_trims is not None and plan.dovi_trims.l2_enabled:
        lay.append(("l2", 5))         # _RT_TRIM_KEYS order
    return lay


def _rt_allowed_keys(plan: PipelinePlan, with_cmat: bool = True) -> set:
    names = {name for name, _ in _rt_layout(plan, with_cmat)}
    out = set()
    if "cmat" in names:
        out.add("cmat")
    if "hdr" in names:
        out.add("hdr")
    if "l2" in names:
        out.add("l2_trims")
    return out


def _pack_rt_all(plan: PipelinePlan, rt: dict, dtype=jnp.float32,
                 with_cmat: bool = True):
    """Pack the runtime overrides (plan defaults fill missing keys) into the
    flat SMEM vector matching :func:`_rt_layout`."""
    segs = []
    for name, _n in _rt_layout(plan, with_cmat):
        if name == "cmat":
            cm = rt.get("cmat")
            if cm is not None:
                segs.append(_pack_cmat_rt(cm["m"], cm["c"], dtype))
            else:
                segs.append(_pack_cmat_rt(plan.cmat_m, plan.cmat_c, dtype))
        elif name == "hdr":
            h = rt.get("hdr") or {}
            p = plan.tonemap_params
            merged = {k: h.get(k, getattr(p, k)) for k in _RT_HDR_KEYS}
            segs.append(tonemap_ops.local_tonemap_rt_scalars(
                plan.tonemap_type, merged))
        elif name == "l2":
            tr = rt.get("l2_trims")
            t = plan.dovi_trims
            vals = ([tr[k] for k in _RT_TRIM_KEYS] if tr is not None
                    else [getattr(t, k) for k in _RT_TRIM_KEYS])
            segs.append(jnp.stack([jnp.asarray(v, dtype) for v in vals]))
    if not segs:
        return None
    return segs[0] if len(segs) == 1 else jnp.concatenate(segs)


def _make_tail_epilogue_rt(plan: PipelinePlan, dtype=jnp.float32,
                           with_cmat: bool = True):
    """Serving variant of :func:`_make_tail_epilogue`: the color matrix, the
    HDR10 luminance metadata for the local tone map, and the DoVi L2 trims
    arrive per call as SMEM scalars (layout per :func:`_rt_layout`), so
    runtime ProcAmp / per-scene metadata changes re-upload parameters
    instead of retracing."""
    off, o = {}, 0
    for name, n in _rt_layout(plan, with_cmat):
        off[name] = o
        o += n

    def epi(y, u, v, rt_ref):
        if "cmat" in off:
            b = off["cmat"]
            rgb = jnp.stack(
                [rt_ref[b + 4 * i] * y + rt_ref[b + 4 * i + 1] * u
                 + rt_ref[b + 4 * i + 2] * v + rt_ref[b + 4 * i + 3]
                 for i in range(3)], axis=0)
        else:
            rgb = jnp.stack([y, u, v], axis=0)
        trims = None
        if "l2" in off:
            b = off["l2"]
            trims = tonemap_ops.DoviTrims(
                **{k: rt_ref[b + i] for i, k in enumerate(_RT_TRIM_KEYS)},
                l2_enabled=True)
        hdr_sc = None
        if "hdr" in off:
            b = off["hdr"]
            hdr_sc = [rt_ref[b + i] for i in range(5)]
        return _tail_common(plan, rgb, trims=trims, hdr_sc=hdr_sc)

    return epi


def _pack_cmat_rt(m, c, dtype=jnp.float32):
    """(3,3) + (3,) -> the (12,) cmat segment of :func:`_rt_layout`."""
    m = jnp.asarray(m, dtype).reshape(3, 3)
    c = jnp.asarray(c, dtype).reshape(3, 1)
    return jnp.concatenate([m, c], axis=1).reshape(-1)


def _make_fused_fn(plan: PipelinePlan, dtype=jnp.float32, with_rt: bool = False,
                   pack_format: str | None = None):
    """TPU-native fused pipeline: chroma upsample + (blend deinterlace) +
    separable resize collapse into one banded matrix per plane per axis
    (linear maps compose), so the YUV->RGB matrix, transfer functions,
    tone map and dither all run at *output* resolution and no full-source-
    size float intermediate ever exists.  Bit-equivalent (to float32
    rounding) with the staged path — enforced by tests/test_fused.py."""
    s = plan.settings
    src, dst = plan.src, plan.dst
    info = plan.info
    use_pallas = (s.use_accel_backend and jax.default_backend() == "tpu"
                  and _vp_format_allowed(s, info))

    src_w, src_h = src.width, src.height
    if plan.src_rect is not None:
        l, t, r, b = plan.src_rect
        src_w, src_h = r - l, b - t
    vid_w, vid_h = dst.video_size

    # luma/full-res axis maps
    cx = scale_ops.select_scaler(src_w, vid_w, s.upscaling,
                                 s.downscaling, s.interpolate_at_50pct)
    cy = scale_ops.select_scaler(src_h, vid_h, s.upscaling,
                                 s.downscaling, s.interpolate_at_50pct)
    wx = scale_ops.build_axis_matrix(cx, src_w, vid_w)
    wy = scale_ops.build_axis_matrix(cy, src_h, vid_h)

    blend = (s.deint_blend and src.interlaced and info.subsampling == 420
             and info.cs_type == ColorSystem.YUV)
    wy_luma = wy
    if blend:
        from .ops.chroma import blend_deinterlace_matrix
        wy_luma = _compose(blend_deinterlace_matrix(src_h), wy)

    if info.cs_type == ColorSystem.YUV:
        dw, dh = info.chroma_div
        ux, uy = chroma_ops.chroma_upsample_matrices(
            src_w // dw, src_h // dh, info.subsampling,
            s.chroma_scaling, plan.src.chroma_location)
        cwx = _compose(ux, wx)
        cwy = _compose(uy, wy)
    else:
        cwx = cwy = None

    norm = 1.0 / (2.0 ** info.plane_bits - 1.0)

    # fully-fused tail: the H pass of every plane + color matrix +
    # corrections/tone-map/dither run inside ONE Pallas kernel, reading the
    # W-passed planes once and writing only the final output (the XLA
    # elementwise tail costs ~220 us/frame per pass at 4K batch 64)
    use_rows3 = (use_pallas and dst.video_rect is None
                 and info.cs_type in (ColorSystem.YUV, ColorSystem.RGB))
    epilogue = _make_tail_epilogue(plan, dtype) if use_rows3 else None
    if info.cs_type == ColorSystem.YUV:
        r3_my, r3_mc = wy_luma, cwy
        r3_wx_y, r3_wx_c = wx, cwx
    else:
        r3_my = r3_mc = wy
        r3_wx_y = r3_wx_c = wx
    r3_my_f = None if r3_my is None else np.asarray(r3_my, np.float32)
    r3_mc_f = None if r3_mc is None else np.asarray(r3_mc, np.float32)

    r3_wxy_f = None if r3_wx_y is None else np.asarray(r3_wx_y, np.float32)
    r3_wxc_f = None if r3_wx_c is None else np.asarray(r3_wx_c, np.float32)
    rt_keys = _rt_allowed_keys(plan)
    epilogue_rt = (_make_tail_epilogue_rt(plan, dtype)
                   if use_rows3 and rt_keys else None)

    # Compact W-pass intermediates (int16 fixed point, kernels/resize_pallas
    # MID16_SCALE): halves the intermediate HBM traffic between the W kernels
    # and the fused H+tail kernel.  Wired to the Settings_t texture-format
    # option: the reference's default TEXFMT_AUTOINT runs 8/10-bit UNORM
    # intermediate textures (Source/DX11VideoProcessor.cpp:1145-1151); our
    # int16 intermediate is ~16x finer than 10-bit UNORM, and an explicit
    # FLOAT16 request gets full float32 (finer than the fp16 it names).
    # int16 overflow guard: a W-pass output is bounded by the column L1
    # norm of its (normalized) weight matrix — |out_j| <= sum_i |w_ij| for
    # inputs in [0,1].  round(x * 16384) must fit int16, so require the
    # bound under 32767/16384; any exotic filter beyond it silently keeps
    # the f32 intermediate (per plane).
    from .kernels.resize_pallas import MID16_SCALE
    _l1 = lambda m: float(np.abs(m).sum(axis=0).max())
    _fits = lambda m: m is not None and _l1(m) * MID16_SCALE <= 32767.0
    mid16 = s.tex_format != TexFormat.FLOAT16
    mid16_y = mid16 and _fits(r3_wxy_f)
    mid16_c = mid16 and _fits(r3_wxc_f)

    def _rows3(planes, rt_scalars=None):
        # two-stage: banded W kernels then the fused H+tail kernel.  (A
        # single whole-pipeline kernel — mega3_tail — was measured at 995
        # f/s vs 1408 for this structure on the headline chain: the per-
        # row-tile W recompute and the serialized W->split->H chains lose
        # more than the saved intermediate traffic.)
        from .kernels import resize_pallas as rp
        wpass = lambda p, mx, q: (p if mx is None else
                                  rp.banded_resize_last_axis(
                                      p, mx, pre_scale=norm, mid16=q))
        yw = wpass(planes[0], r3_wxy_f, mid16_y)
        uw = wpass(planes[1], r3_wxc_f, mid16_c)
        vw = wpass(planes[2], r3_wxc_f, mid16_c)
        vid_w, vid_h = dst.video_size
        unscale = 1.0 / rp.MID16_SCALE
        kw = dict(
            y_scale=(norm if r3_wxy_f is None
                     else unscale if mid16_y else None),
            c_scale=(norm if r3_wxc_f is None
                     else unscale if mid16_c else None))
        if rt_scalars is not None:
            return rp.rows3_tail(
                yw, uw, vw, r3_my_f, r3_mc_f, vid_h, epilogue_rt,
                rt_scalars=rt_scalars, pack_format=pack_format, **kw)
        return rp.rows3_tail(yw, uw, vw, r3_my_f, r3_mc_f, vid_h, epilogue,
                             pack_format=pack_format, **kw)

    def fn(planes, rt=None):
        rt = rt or {}
        planes = _crop_planes(plan, planes)
        if use_rows3 and len(planes) == 3 and set(rt) <= rt_keys:
            return _rows3(planes,
                          _pack_rt_all(plan, rt, dtype) if rt else None)
        app = lambda p, a, b: _fused_apply2d(p, a, b, use_pallas, norm, dtype)
        if info.cs_type == ColorSystem.GRAY:
            y = app(planes[0], wx, wy)
            m, c = plan.cmat_m, plan.cmat_c
            rgb = jnp.stack([y * m[i, 0] + c[i] for i in range(3)], axis=-3)
        else:
            if info.cs_type == ColorSystem.YUV:
                y = app(planes[0], wx, wy_luma)
                # (stacking U+V into one kernel call was tried: the stack
                # copy costs more than the saved dispatch — keep separate)
                u = app(planes[1], cwx, cwy)
                v = app(planes[2], cwx, cwy)
                comps = (y, u, v)
            else:
                comps = tuple(app(p, wx, wy) for p in planes)
            if plan.apply_matrix:
                rt_cmat = rt.get("cmat")
                if rt_cmat is not None:
                    m = jnp.asarray(rt_cmat["m"], dtype)
                    c = jnp.asarray(rt_cmat["c"], dtype)
                else:
                    m = jnp.asarray(plan.cmat_m, dtype)
                    c = jnp.asarray(plan.cmat_c, dtype)
                rgb = jnp.stack(
                    [m[i, 0] * comps[0] + m[i, 1] * comps[1]
                     + m[i, 2] * comps[2] + c[i] for i in range(3)], axis=-3)
            else:
                rgb = jnp.stack(comps, axis=-3)
        trims = _resolve_rt_trims(plan, rt)
        rgb = _corrections(plan, rgb, trims=trims)
        if plan.local_tonemap:
            hdr = rt.get("hdr")
            if hdr is not None:
                rgb = tonemap_ops.local_tonemap_pq_rt(
                    rgb, plan.tonemap_type, hdr, trims=trims, axis=-3,
                    window=plan.hdr10plus_window)
            else:
                rgb = _local_tonemap(plan, rgb, trims=trims)
        rgb = _final_pass(plan, rgb)
        if pack_format is not None:
            rgb = _pack_surface_xla(rgb, pack_format)
        return rgb

    if with_rt:
        return fn
    return lambda planes: fn(planes)


def _make_dovi_fused_fn(plan: PipelinePlan, dtype=jnp.float32,
                        with_rt: bool = False,
                        pack_format: str | None = None):
    """DoVi split-fused pipeline: the fusion splits at the (nonlinear)
    reshape.  Stage A streams the raw integer planes through the banded
    kernels once — normalization folded into the chroma-upsample weights —
    producing full-source-res ycc; the reshape (static curves or runtime
    ``rt["dovi_curves"]``), RPU matrix and LMS PQ round-trip run there
    exactly as the reference's convert pass (Source/Shaders.cpp:809-859);
    stage B resizes R,G,B with the banded kernels.  This keeps DoVi serving
    on the fast path instead of the dense staged matmuls."""
    s = plan.settings
    src, dst = plan.src, plan.dst
    info = plan.info
    use_pallas = (s.use_accel_backend and jax.default_backend() == "tpu"
                  and _vp_format_allowed(s, info))

    src_w, src_h = src.width, src.height
    if plan.src_rect is not None:
        l, t, r, b = plan.src_rect
        src_w, src_h = r - l, b - t
    vid_w, vid_h = dst.video_size

    dw, dh = info.chroma_div
    ux, uy = chroma_ops.chroma_upsample_matrices(
        src_w // dw, src_h // dh, info.subsampling,
        s.chroma_scaling, src.chroma_location)

    blend = (s.deint_blend and src.interlaced and info.subsampling == 420)
    by = chroma_ops.blend_deinterlace_matrix(src_h) if blend else None

    cx = scale_ops.select_scaler(src_w, vid_w, s.upscaling,
                                 s.downscaling, s.interpolate_at_50pct)
    cy = scale_ops.select_scaler(src_h, vid_h, s.upscaling,
                                 s.downscaling, s.interpolate_at_50pct)
    wx = scale_ops.build_axis_matrix(cx, src_w, vid_w)
    wy = scale_ops.build_axis_matrix(cy, src_h, vid_h)

    norm = 1.0 / (2.0 ** info.plane_bits - 1.0)

    # stage A through rows3_tail: chroma W upsample via the banded kernel,
    # then chroma H upsample + reshape + ycc matrix + LMS PQ round-trip
    # inside ONE kernel at source res.  Runtime curves/ProcAmp ride the
    # SMEM scalar vector (layout [cmat 12][flattened curves]); the curve
    # STRUCTURE is static from the plan's metadata (curve_structure), so
    # per-scene value updates never retrace
    from .ops import dovi as dovi_ops_mod
    struct_a = dovi_ops_mod.curve_structure(plan.dovi)
    use_rows3_a = use_pallas
    ux_f = None if ux is None else np.asarray(ux, np.float32)
    uy_f = None if uy is None else np.asarray(uy, np.float32)
    by_f = None if by is None else np.asarray(by, np.float32)
    am = np.asarray(plan.cmat_m, np.float32)
    ac = np.asarray(plan.cmat_c, np.float32)

    def _epi_a(y, u, v):
        comps = dovi_ops_mod.reshape(jnp.stack([y, u, v], axis=0),
                                     plan.dovi, axis=0)
        yc, uc, vc = comps[0], comps[1], comps[2]
        rgb = jnp.stack([am[i, 0] * yc + am[i, 1] * uc + am[i, 2] * vc
                         + ac[i] for i in range(3)], axis=0)
        return dovi_ops_mod.apply_lms_matrix(rgb, plan.dovi, axis=0)

    def _epi_a_rt(y, u, v, rt_ref):
        yc, uc, vc = dovi_ops_mod.reshape_tiles_from_scalars(
            (y, u, v), lambda i: rt_ref[i], 12, struct_a)
        rgb = jnp.stack([rt_ref[4 * i] * yc + rt_ref[4 * i + 1] * uc
                         + rt_ref[4 * i + 2] * vc + rt_ref[4 * i + 3]
                         for i in range(3)], axis=0)
        return dovi_ops_mod.apply_lms_matrix(rgb, plan.dovi, axis=0)

    def _pack_stage_a_rt(rt):
        cm = rt.get("cmat")
        seg0 = (_pack_cmat_rt(cm["m"], cm["c"], dtype) if cm is not None
                else _pack_cmat_rt(plan.cmat_m, plan.cmat_c, dtype))
        curves = rt.get("dovi_curves")
        if curves is None:
            curves = {k: jnp.asarray(v) for k, v in
                      dovi_ops_mod.pack_curves(plan.dovi).items()}
        return jnp.concatenate(
            [seg0, dovi_ops_mod.flatten_curve_scalars(curves, struct_a,
                                                      dtype)])

    # stage B through the fused tail kernel: H resize of R,G,B + the
    # corrections/local-tone-map/dither chain inside rows3_tail (no cmat —
    # stage A consumed it); runtime HDR/L2-trim scalars ride SMEM
    use_rows3_b = use_pallas and dst.video_rect is None
    wx_f = None if wx is None else np.asarray(wx, np.float32)
    wy_f = None if wy is None else np.asarray(wy, np.float32)
    rt_keys_b = _rt_allowed_keys(plan, with_cmat=False)
    epi_b = _make_tail_epilogue(plan, dtype, with_cmat=False) \
        if use_rows3_b else None
    epi_b_rt = (_make_tail_epilogue_rt(plan, dtype, with_cmat=False)
                if use_rows3_b and rt_keys_b else None)

    def fn(planes, rt=None):
        from .ops import dovi as dovi_ops
        rt = rt or {}
        planes = _crop_planes(plan, planes)
        app = lambda p, a, b, ps: _fused_apply2d(p, a, b, use_pallas, ps,
                                                 dtype)
        keys_ok = set(rt) <= ({"dovi_curves", "cmat"} | rt_keys_b)
        # the fast-pow change flipped this tradeoff: with the LMS PQ round
        # trip ~35% cheaper, the ~100 MB/frame of saved intermediate HBM
        # traffic now beats the per-column-stripe W-dot recompute (578.1
        # vs 563.4 f/s planar, 598.5 vs 578.1 packed; c8 4K batch 32 —
        # pre-fast-pow it measured 260.5 vs 273.7 the other way).  The
        # two-stage form stays reachable with VRT_TPU_DOVI_MID=0.
        use_mid = os.environ.get("VRT_TPU_DOVI_MID", "1") != "0"
        if (use_mid and use_rows3_a and use_rows3_b and keys_ok
                and len(planes) == 3):
            # single-intermediate chain (VERDICT r2 #5): chroma W upsample,
            # then ONE rows3_mid kernel runs [chroma H-up -> reshape + ycc
            # matrix + LMS -> H-downscale] per column stripe — the
            # full-source-res PQ RGB between the old stages A/B (~100
            # MB/frame at 4K) never exists — and cols3_tail finishes with
            # W-resize + corrections + dither (+ packing) per frame, like
            # the reference's one-pass DoVi chain (Source/Shaders.cpp:531-859)
            from .kernels import resize_pallas as rp
            from .kernels.deint_pallas import cols3_tail, rows3_mid
            yp, up, vp = planes
            uw = up if ux_f is None else rp.banded_resize_last_axis(
                up, ux_f, pre_scale=norm)
            vw = vp if ux_f is None else rp.banded_resize_last_axis(
                vp, ux_f, pre_scale=norm)
            rt_a = (_pack_stage_a_rt(rt)
                    if rt.keys() & {"dovi_curves", "cmat"} else None)
            mid = rows3_mid(
                yp, uw, vw, by_f, uy_f, src_h,
                _epi_a_rt if rt_a is not None else _epi_a,
                wy_f, vid_h,
                y_scale=norm, c_scale=norm if ux_f is None else None,
                rt_scalars=rt_a)
            rt_tail = {k: rt[k] for k in rt_keys_b & set(rt)}
            chs = [mid[..., i, :, :] for i in range(3)]
            if rt_tail and epi_b_rt is not None:
                return cols3_tail(
                    chs[0], chs[1], chs[2], wx_f, wx_f, vid_w, epi_b_rt,
                    rt_scalars=_pack_rt_all(plan, rt_tail, dtype,
                                            with_cmat=False),
                    pack_format=pack_format)
            return cols3_tail(chs[0], chs[1], chs[2], wx_f, wx_f, vid_w,
                              epi_b, pack_format=pack_format)
        if use_rows3_a and keys_ok and len(planes) == 3:
            from .kernels import resize_pallas as rp
            yp, up, vp = planes
            uw = up if ux_f is None else rp.banded_resize_last_axis(
                up, ux_f, pre_scale=norm)
            vw = vp if ux_f is None else rp.banded_resize_last_axis(
                vp, ux_f, pre_scale=norm)
            kw = dict(y_scale=norm,
                      c_scale=norm if ux_f is None else None)
            if rt.keys() & {"dovi_curves", "cmat"}:
                rgb = rp.rows3_tail(yp, uw, vw, by_f, uy_f, src_h, _epi_a_rt,
                                    rt_scalars=_pack_stage_a_rt(rt), **kw)
            else:
                rgb = rp.rows3_tail(yp, uw, vw, by_f, uy_f, src_h, _epi_a,
                                    **kw)
        else:
            # stage A: integer planes -> source-res float ycc (XLA path)
            y = app(planes[0], None, by, norm)
            u = app(planes[1], ux, uy, norm)
            v = app(planes[2], ux, uy, norm)
            comps = jnp.stack([y, u, v], axis=-3)

            rt_curves = rt.get("dovi_curves")
            if rt_curves is not None:
                comps = dovi_ops.reshape_dynamic(
                    comps, rt_curves, axis=-3,
                    structure=dovi_ops.curve_structure(plan.dovi))
            else:
                comps = dovi_ops.reshape(comps, plan.dovi, axis=-3)

            rt_cmat = rt.get("cmat")
            if rt_cmat is not None:
                m = jnp.asarray(rt_cmat["m"], dtype)
                c = jnp.asarray(rt_cmat["c"], dtype)
            else:
                m = jnp.asarray(plan.cmat_m, dtype)
                c = jnp.asarray(plan.cmat_c, dtype)
            yc = comps[..., 0, :, :]
            uc = comps[..., 1, :, :]
            vc = comps[..., 2, :, :]
            rgb = [m[i, 0] * yc + m[i, 1] * uc + m[i, 2] * vc + c[i]
                   for i in range(3)]
            rgb = dovi_ops.apply_lms_matrix(jnp.stack(rgb, axis=-3),
                                            plan.dovi, axis=-3)

        # stage B: banded resize of the PQ-encoded RGB to output res
        if use_rows3_b and keys_ok:
            from .kernels import resize_pallas as rp
            chs = [rgb[..., i, :, :] for i in range(3)]
            if wx_f is not None:
                chs = [rp.banded_resize_last_axis(ch, wx_f) for ch in chs]
            rt_tail = {k: rt[k] for k in rt_keys_b & set(rt)}
            if rt_tail and epi_b_rt is not None:
                return rp.rows3_tail(
                    chs[0], chs[1], chs[2], wy_f, wy_f, vid_h, epi_b_rt,
                    rt_scalars=_pack_rt_all(plan, rt_tail, dtype,
                                            with_cmat=False),
                    pack_format=pack_format)
            return rp.rows3_tail(chs[0], chs[1], chs[2], wy_f, wy_f, vid_h,
                                 epi_b, pack_format=pack_format)
        if wx is not None or wy is not None:
            rgb = jnp.stack([app(rgb[..., i, :, :], wx, wy, None)
                             for i in range(3)], axis=-3)

        trims = _resolve_rt_trims(plan, rt)
        rgb = _corrections(plan, rgb, trims=trims)
        if plan.local_tonemap:
            hdr = rt.get("hdr")
            if hdr is not None:
                rgb = tonemap_ops.local_tonemap_pq_rt(
                    rgb, plan.tonemap_type, hdr, trims=trims, axis=-3,
                    window=plan.hdr10plus_window)
            else:
                rgb = _local_tonemap(plan, rgb, trims=trims)
        rgb = _final_pass(plan, rgb)
        if pack_format is not None:
            rgb = _pack_surface_xla(rgb, pack_format)
        return rgb

    if with_rt:
        return fn
    return lambda planes: fn(planes)


def make_frame_fn(plan: PipelinePlan, dtype=jnp.float32, fused: bool | None = None,
                  pack_surface: bool = False,
                  rotation: int = 0, flip: bool = False):
    """Build the per-frame processing function (unjitted).

    Input: tuple of plane arrays (uint8/uint16), each (..., Hp, Wp) with
    matching leading batch dims.  Output: (..., 3, out_h, out_w) float32 in
    [0,1] (SDR/PQ encoded), quantized per the plan — or, with
    ``pack_surface``, an (..., out_h, out_w) int32 surface of packed
    R10G10B10A2/RGBA8 dwords (the swap-chain backbuffer analogue; view as
    uint32, decode with formats.unpack_rgb10).  On the fused kernel path
    the packing happens in-kernel (3x less output HBM traffic).

    ``fused=None`` auto-selects the fused linear-resample path when legal
    (see :func:`_can_fuse`); ``False`` forces the staged reference path.

    ``rotation``/``flip`` produce ``rotate_flip(out, rotation, flip)``.
    For rotation 90 + flip (a pure transpose) on the one-pass Jinc2
    kernel chain, the rotation RIDES THE RESIZE (the reference's
    FillVertices permutation, Source/DX11VideoProcessor.cpp:3115-3199):
    the kernel's output tiles transpose in-register at the store, so the
    final surface is written directly with zero extra HBM passes and the
    compute stays bit-identical to the unrotated program.  All other
    combinations rotate the finished surface (the packed dword IS one
    pixel)."""
    if rotation not in (0, 90, 180, 270):
        raise ValueError(f"rotation must be 0/90/180/270, got {rotation}")
    want_rot = rotation != 0 or flip
    from .ops import geometry as geo_ops

    s = plan.settings
    dst = plan.dst
    fmt = surface_pack_format(dst) if pack_surface else None

    if fused is None:
        fused = _can_fuse(plan) or _can_split_fuse(plan)
    if fused:
        if plan.dovi is not None:
            base = _make_dovi_fused_fn(plan, dtype, pack_format=fmt)
        else:
            base = _make_fused_fn(plan, dtype, pack_format=fmt)
        if not want_rot:
            return base
        return lambda planes: geo_ops.rotate_flip(base(planes),
                                                  rotation, flip)

    # Jinc2 with a dither-only tail: quantization runs inside the one-pass
    # kernel's epilogue (output tile origins are 128-aligned, so the dither
    # pattern needs no phase offset) — saves the full-size XLA final pass.
    j2_tail = (s.upscaling == Upscaling.JINC2 and s.vp_scaling
               and not (plan.convert_to_sdr or plan.hlg_to_pq
                        or plan.fix_bt2020_sdr or plan.local_tonemap)
               and dst.video_rect is None
               and plan.dither_bits not in (None, 0))

    # staged-path convert through the fused kernels: chroma W upsample via
    # the banded kernel, chroma H upsample + color matrix in rows3_tail —
    # one pass over the source instead of ~5 XLA elementwise passes
    info = plan.info
    blend = (s.deint_blend and plan.src.interlaced and info.subsampling == 420
             and info.cs_type == ColorSystem.YUV)
    use_kconvert = (s.use_accel_backend and jax.default_backend() == "tpu"
                    and _vp_format_allowed(s, info)
                    and info.cs_type == ColorSystem.YUV
                    and plan.apply_matrix and plan.dovi is None and not blend)
    if use_kconvert:
        src_w, src_h = plan.src.width, plan.src.height
        if plan.src_rect is not None:
            l0, t0, r0, b0 = plan.src_rect
            src_w, src_h = r0 - l0, b0 - t0
        dw, dh = info.chroma_div
        kux, kuy = chroma_ops.chroma_upsample_matrices(
            src_w // dw, src_h // dh, info.subsampling,
            s.chroma_scaling, plan.src.chroma_location)
        kux_f = None if kux is None else np.asarray(kux, np.float32)
        kuy_f = None if kuy is None else np.asarray(kuy, np.float32)
        knorm = 1.0 / (2.0 ** info.plane_bits - 1.0)
        kcm = np.asarray(plan.cmat_m, np.float32)
        kcc = np.asarray(plan.cmat_c, np.float32)

        def _cmat_epi(yt, ut, vt):
            return jnp.stack(
                [kcm[i, 0] * yt + kcm[i, 1] * ut + kcm[i, 2] * vt + kcc[i]
                 for i in range(3)], axis=0)

        def _kconvert(planes):
            from .kernels import resize_pallas as rp
            y, u, v = planes
            if kux_f is not None:
                u = rp.banded_resize_last_axis(u, kux_f, pre_scale=knorm)
                v = rp.banded_resize_last_axis(v, kux_f, pre_scale=knorm)
            return rp.rows3_tail(
                y, u, v, None, kuy_f, src_h, _cmat_epi,
                y_scale=knorm,
                c_scale=knorm if kux_f is None else None)

    # fused rotation: ONLY the pure-transpose case (rotation 90 + flip,
    # rf_decompose == (True, False, False)) rides the kernel — as a
    # transposed STORE, leaving the compute bit-identical to the proven
    # unrotated program.  A full rotated-geometry variant (pre-rotated
    # planes + transform_axis_maps'd weights) was built and REMOVED in r5:
    # exact in interpret mode at every size including 1080p->4K, ~32 dB
    # corrupt on real hardware — the third interpret-exact/hardware-corrupt
    # Mosaic miscompile on this kernel family (history: _make_kernel3's
    # pipelining note).  Do not re-attempt without a hardware gate.
    k3_transpose = (want_rot and
                    geo_ops.rf_decompose(rotation, flip) ==
                    (True, False, False))

    def _j2_epilogue(tile):
        db = plan.dither_bits
        if db < 0:
            return dither_ops.quantize(jnp.clip(tile, 0.0, 1.0), -db)
        return dither_ops.ordered_dither_iota(jnp.clip(tile, 0.0, 1.0), db)

    # whole-chain Jinc2 kernel: raw integer planes -> chroma upsample +
    # color matrix + 2D Jinc2 + anti-ringing + dither in ONE kernel (no
    # convert intermediate at all); engages when the 2D one-pass geometry
    # applies and the packed weights fit scoped VMEM.  For the rotation-
    # 90+flip (pure transpose) case the kernel computes the plan's normal
    # pre-rotation frame and only the STORE transposes.
    use_k3 = False
    if use_kconvert and j2_tail and not (want_rot and not k3_transpose):
        # the kernel always computes the plan's PRE-rotation frame at the
        # plan's own dims; with k3_transpose only the STORE transposes
        k3_w, k3_h = dst.video_size
        rx3, ry3 = scale_ops.jinc2_passes(src_h, src_w, k3_h, k3_w,
                                          s.interpolate_at_50pct)
        if (rx3 == "up" and ry3 in ("up", None)
                and (src_h, src_w) != (k3_h, k3_w)):
            from .kernels.jinc2_pallas import jinc2_convert_fits
            use_k3 = jinc2_convert_fits(src_h, k3_h, src_w, k3_w,
                                        kuy_f, kux_f,
                                        y_scale=knorm, c_scale=knorm)

    def _maybe_pack(rgb):
        return rgb if fmt is None else _pack_surface_xla(rgb, fmt)

    def _k3_call(planes):
        from .kernels.jinc2_pallas import jinc2_convert_fused
        y, u, v = _crop_planes(plan, planes)
        # packing happens inside the kernel when a surface is requested;
        # with k3_transpose the store transposes (final orientation out)
        return jinc2_convert_fused(y, u, v, kuy_f, kux_f, kcm, kcc,
                                   k3_h, k3_w, knorm, knorm,
                                   epilogue=_j2_epilogue,
                                   pack_format=fmt,
                                   out_transpose=k3_transpose)

    def fn(planes):
        if use_k3 and len(planes) == 3:
            return _k3_call(planes)
        if use_kconvert and len(planes) == 3:
            rgb = _kconvert(_crop_planes(plan, planes))
        else:
            rgb = _convert_color(plan, planes, dtype)
        if not s.vp_scaling:
            # shader-path order: corrections at source resolution
            rgb = _corrections(plan, rgb)
        vid_w, vid_h = dst.video_size
        if j2_tail:
            h, w = rgb.shape[-2], rgb.shape[-1]
            rx, ry = scale_ops.jinc2_passes(h, w, vid_h, vid_w,
                                            s.interpolate_at_50pct)
            if rx == "up" and ry in ("up", None) and (h, w) != (vid_h, vid_w):
                return _maybe_pack(scale_ops.jinc2_resize(
                    rgb, vid_h, vid_w, epilogue=_j2_epilogue))
        rgb = scale_ops.resize_plane(
            rgb, vid_h, vid_w,
            upscaling=s.upscaling, downscaling=s.downscaling,
            interpolate_at_50pct=s.interpolate_at_50pct)
        if s.vp_scaling:
            rgb = _corrections(plan, rgb)
        if plan.local_tonemap:
            rgb = _local_tonemap(plan, rgb)
        return _maybe_pack(_final_pass(plan, rgb))

    if not want_rot:
        return fn

    def fn_rot(planes):
        if use_k3 and len(planes) == 3:
            return _k3_call(planes)      # already in final orientation
        return geo_ops.rotate_flip(fn(planes), rotation, flip)

    return fn_rot


def serving_rt_keys(plan: PipelinePlan) -> set:
    """The rt keys this plan's serving program accepts — one per stage that
    exists statically (the cbuffer-segment discipline of :func:`_rt_layout`,
    independent of which execution path serves the plan)."""
    out = set()
    if plan.apply_matrix:
        out.add("cmat")
    if plan.local_tonemap:
        out.add("hdr")
    if plan.dovi_trims is not None and plan.dovi_trims.l2_enabled:
        out.add("l2_trims")
    if plan.dovi is not None:
        out.add("dovi_curves")
    return out


def make_serving_fn(plan: PipelinePlan, dtype=jnp.float32,
                    pack_surface: bool = False):
    """Serving-mode pipeline: ONE compiled program that takes per-frame
    runtime metadata alongside the planes, so title/scene changes never
    retrace (the reference analogously re-uploads cbuffers per sample
    rather than recompiling shaders):

      fn(planes, rt) with optional rt keys:
        "hdr"         — dict of HDR10 scalars for the local tone map
                        (see ops.tonemap.local_tonemap_pq_rt)
        "dovi_curves" — packed reshape tensors (ops.dovi.pack_curves)
        "cmat"        — {"m": (3,3), "c": (3,)} color-matrix override for
                        runtime ProcAmp (brightness/contrast/hue/saturation)
        "l2_trims"    — dict of DoVi L2 trim scalars (chroma_weight,
                        saturation_gain, trim_slope/offset/power); needs a
                        plan whose trims stage exists

    The plan decides *which* stages exist (static); rt supplies their
    parameters (dynamic).  On the fused path the parameters ride the tail
    kernel's SMEM scalar block (:func:`_rt_layout`); elsewhere they are
    traced tensors — either way, no retrace.

    The returned fn validates rt keys at trace time: unknown keys, or
    known keys whose stage does not exist in this plan, raise with the
    allowed set (a typo'd key must fail loudly, not silently fall off the
    kernel path onto a 2x-slower program).  Attributes on the returned fn
    (survive one ``jax.jit`` wrap via inspection before jitting):

      fn.allowed_rt_keys — the plan's valid rt keys;
      fn.dovi_structure  — the reshape structure the program was traced
                           for (None without DoVi);
      fn.pack_curves(meta) — packs a scene's RPU curves validated against
                           that structure (structural drift raises instead
                           of silently corrupting frames).
    """
    s = plan.settings
    dst = plan.dst
    fmt = surface_pack_format(dst) if pack_surface else None

    allowed = serving_rt_keys(plan)
    structure = None
    if plan.dovi is not None:
        from .ops import dovi as dovi_ops
        structure = dovi_ops.curve_structure(plan.dovi)

    def _finish(inner):
        def checked(planes, rt=None):
            rt = rt or {}
            bad = set(rt) - allowed
            if bad:
                raise ValueError(
                    f"unknown serving rt key(s) {sorted(bad)}; this plan "
                    f"accepts {sorted(allowed)} (stage presence is static "
                    "— re-plan to add stages)")
            return inner(planes, rt)

        checked.allowed_rt_keys = frozenset(allowed)
        checked.dovi_structure = structure
        if structure is not None:
            from .ops import dovi as dovi_ops

            def pack_scene_curves(meta):
                return dovi_ops.pack_curves(meta, like=structure)

            checked.pack_curves = pack_scene_curves
        return checked

    if _can_fuse(plan):
        # the fused linear-prefix path supports the cmat/hdr/l2_trims
        # runtime hooks directly
        return _finish(_make_fused_fn(plan, dtype, with_rt=True,
                                      pack_format=fmt))
    if _can_split_fuse(plan):
        # DoVi serving: split-fused path with runtime reshape curves —
        # per-scene RPU updates stay on the banded kernels
        return _finish(_make_dovi_fused_fn(plan, dtype, with_rt=True,
                                           pack_format=fmt))

    def fn(planes, rt):
        rgb = _convert_color(plan, planes, dtype,
                             rt_curves=rt.get("dovi_curves"),
                             rt_cmat=rt.get("cmat"))
        trims = _resolve_rt_trims(plan, rt)
        if not s.vp_scaling:
            rgb = _corrections(plan, rgb, trims=trims)
        vid_w, vid_h = dst.video_size
        rgb = scale_ops.resize_plane(
            rgb, vid_h, vid_w,
            upscaling=s.upscaling, downscaling=s.downscaling,
            interpolate_at_50pct=s.interpolate_at_50pct)
        if s.vp_scaling:
            rgb = _corrections(plan, rgb, trims=trims)
        if plan.local_tonemap:
            hdr = rt.get("hdr")
            if hdr is not None:
                rgb = tonemap_ops.local_tonemap_pq_rt(
                    rgb, plan.tonemap_type, hdr, trims=trims, axis=-3,
                    window=plan.hdr10plus_window)
            else:
                rgb = _local_tonemap(plan, rgb, trims=trims)
        rgb = _final_pass(plan, rgb)
        if fmt is not None:
            rgb = _pack_surface_xla(rgb, fmt)
        return rgb

    return _finish(fn)


def make_deint_frame_fn(plan: PipelinePlan, field: int,
                        top_field_first: bool = True, dtype=jnp.float32,
                        motion_threshold: float = 8.0 / 255.0,
                        pack_surface: bool = False):
    """Per-field processing function for interlaced content: motion-adaptive
    deinterlace of every plane over a (prev, cur, next) window, then the
    regular pipeline — the explicit-kernel replacement of the D3D11VP
    rate-conversion blt with past/future reference frames
    (Source/D3D11VP.cpp:292-331,893-960).

    Signature: fn(prev_planes, cur_planes, next_planes) -> output frame for
    ``field`` (0 = first temporal field, 1 = second; render both for
    double-rate output, Source/DX11VideoProcessor.cpp:2176-2197).
    """
    from .ops import deinterlace as di

    base = make_frame_fn(plan, dtype, pack_surface=pack_surface)
    maxval = 2.0 ** plan.info.plane_bits - 1.0

    def fn(prev_planes, cur_planes, next_planes):
        deint = []
        for p, c, n in zip(prev_planes, cur_planes, next_planes):
            deint.append(di.motion_adaptive(
                c.astype(dtype), p.astype(dtype), n.astype(dtype),
                field=field, top_field_first=top_field_first,
                threshold=motion_threshold * maxval))
        return base(tuple(deint))

    return fn


def _can_kernel_deint(plan: PipelinePlan) -> bool:
    """The fully-fused deint path (deint3_rows_dual + cols3_tail): VP-order
    fusable plan, planar-YUV 420/444 source, no geometry embeds, 16-divisible
    plane heights, TPU accel backend."""
    s = plan.settings
    info = plan.info
    dw, dh = info.chroma_div
    return (s.use_accel_backend and jax.default_backend() == "tpu"
            and _vp_format_allowed(s, info) and _can_fuse(plan)
            and info.cs_type == ColorSystem.YUV and dw in (1, 2)
            and plan.src_rect is None and plan.dst.video_rect is None)


def make_deint_fields_fn(plan: PipelinePlan, top_field_first: bool = True,
                         dtype=jnp.float32,
                         motion_threshold: float = 8.0 / 255.0,
                         pack_surface: bool = False,
                         force_kernel: bool = False):
    """Double-rate variant of :func:`make_deint_frame_fn`: ONE traced
    program renders BOTH temporal fields of a frame, so the integer→float
    casts and the |next - prev| motion field are computed once and shared
    instead of once per field, and the two field renders dispatch as a
    single call.  Returns fn(prev, cur, next) -> (field0, field1).

    On TPU with a fusable plan the whole chain runs in kernels with NO
    full-size float round-trip (VERDICT r2 #4): stage A fuses the
    motion-adaptive select into the banded H-resize prologue of all three
    planes for both fields (kernels/deint_pallas.deint3_rows_dual — the
    rate-converter blt analogue, Source/D3D11VP.cpp:893-960), stage B runs
    each field's W-resize + color matrix + corrections + dither (+ packing)
    in one cols3_tail kernel."""
    from .ops import deinterlace as di

    maxval = 2.0 ** plan.info.plane_bits - 1.0
    fmt = surface_pack_format(plan.dst) if pack_surface else None

    if force_kernel or _can_kernel_deint(plan):
        from .kernels.deint_pallas import cols3_tail, deint3_rows_dual
        s = plan.settings
        src, dst = plan.src, plan.dst
        info = plan.info
        vid_w, vid_h = dst.video_size
        cx = scale_ops.select_scaler(src.width, vid_w, s.upscaling,
                                     s.downscaling, s.interpolate_at_50pct)
        cy = scale_ops.select_scaler(src.height, vid_h, s.upscaling,
                                     s.downscaling, s.interpolate_at_50pct)
        wx = scale_ops.build_axis_matrix(cx, src.width, vid_w)
        wy = scale_ops.build_axis_matrix(cy, src.height, vid_h)
        dw, dh = info.chroma_div
        ux, uy = chroma_ops.chroma_upsample_matrices(
            src.width // dw, src.height // dh, info.subsampling,
            s.chroma_scaling, src.chroma_location)
        cwx = _compose(ux, wx)
        cwy = _compose(uy, wy)
        norm = 1.0 / (2.0 ** info.plane_bits - 1.0)
        # stage A needs actual H maps for the in-kernel band dot
        my_y = np.asarray(wy if wy is not None else np.eye(src.height),
                          np.float32)
        my_c = np.asarray(cwy if cwy is not None else
                          np.eye(src.height // dh), np.float32)
        wx_f = None if wx is None else np.asarray(wx, np.float32)
        cwx_f = None if cwx is None else np.asarray(cwx, np.float32)
        epi = _make_tail_epilogue(plan, dtype)
        thr = motion_threshold * maxval

        def fn(prev_planes, cur_planes, next_planes):
            f0, f1 = deint3_rows_dual(
                tuple(prev_planes), tuple(cur_planes), tuple(next_planes),
                my_y, my_c, vid_h, thr, top_field_first=top_field_first,
                y_scale=norm, c_scale=norm, keep_pad=True)
            outs = []
            for yf, uf, vf in (f0, f1):
                out = cols3_tail(
                    yf, uf, vf, wx_f, cwx_f, vid_w, epi,
                    y_scale=1.0 if wx_f is None else None,
                    c_scale=1.0 if cwx_f is None else None,
                    pack_format=fmt)
                # stage A handed over its padded rows (no re-pad copy);
                # crop them from the final surface
                outs.append(out[..., :vid_h, :] if out.shape[-2] != vid_h
                            else out)
            return outs[0], outs[1]

        return fn

    base = make_frame_fn(plan, dtype, pack_surface=pack_surface)

    def fn(prev_planes, cur_planes, next_planes):
        d0, d1 = [], []
        for p, c, n in zip(prev_planes, cur_planes, next_planes):
            cf = c.astype(dtype)
            pf = p.astype(dtype)
            nf = n.astype(dtype)
            kw = dict(top_field_first=top_field_first,
                      threshold=motion_threshold * maxval)
            d0.append(di.motion_adaptive(cf, pf, nf, field=0, **kw))
            d1.append(di.motion_adaptive(cf, pf, nf, field=1, **kw))
        return base(tuple(d0)), base(tuple(d1))

    return fn


class VideoProcessor:
    """High-level per-config processor: plan + jitted function.

    The TPU analogue of CVideoProcessor/CDX11VideoProcessor: construct per
    media type (InitMediaType), then call :meth:`process` per frame/batch
    (ProcessSample -> Process).
    """

    def __init__(self, settings: Settings, src: SourceDescriptor,
                 dst: OutputDescriptor, dtype=jnp.float32,
                 pack_surface: bool = False):
        self.plan = plan_pipeline(settings, src, dst)
        self.dtype = dtype
        self.pack_surface = pack_surface
        self._fn = jax.jit(make_frame_fn(self.plan, dtype,
                                         pack_surface=pack_surface))

    def process(self, planes) -> jax.Array:
        """planes: sequence of numpy/jax arrays in canonical plane order."""
        return self._fn(tuple(jnp.asarray(p) for p in planes))

    def process_frame(self, frame) -> jax.Array:
        """Process an unpacked :class:`videorenderer_tpu.formats.PlanarFrame`."""
        return self.process(frame.planes)

    def process_packed(self, buf) -> jax.Array:
        """Ship the PACKED frame bytes to the device (smallest transfer) and
        unpack there — the analogue of the reference sampling packed
        textures on-GPU (Source/Shaders.cpp:82-529) instead of repacking on
        the CPU.  ``buf``: bytes or array holding one tightly-packed frame
        (leading batch dims allowed on arrays already shaped (..., n_words)).
        Falls back to the host unpackers for formats without a device
        unpacker."""
        from .formats import unpack_frame
        from .kernels.unpack_device import (DEVICE_BUFFER_DTYPE,
                                            has_device_unpacker,
                                            unpack_frame_device)
        info = self.plan.info
        src = self.plan.src
        if not has_device_unpacker(info.name):
            return self.process(
                unpack_frame(info.cformat, buf, src.width, src.height).planes)
        if isinstance(buf, (bytes, bytearray, memoryview)):
            buf = np.frombuffer(buf, DEVICE_BUFFER_DTYPE[info.name])
        if not hasattr(self, "_packed_fn"):
            self._packed_fn = jax.jit(lambda b: self._fn(unpack_frame_device(
                info.name, b, src.width, src.height)))
        return self._packed_fn(jnp.asarray(buf))
