"""On-device smoke tests — run only when a real TPU backend is present.

The CPU suite validates every kernel in interpret mode; these compile and
execute the hot Pallas paths on hardware (Mosaic legalization, scoped-VMEM
fit, SMEM plumbing).  Run manually on a TPU host (VRT_TPU_SMOKE=1 stops
conftest from forcing the CPU platform):

    VRT_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="needs a real TPU backend")


def _nv12(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, (h, w), np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), np.uint8))


def test_fused_headline_chain_small():
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor, VideoProcessor)
    from videorenderer_tpu.csputils import CSP
    vp = VideoProcessor(
        Settings(),
        SourceDescriptor(format=ColorFormat.NV12, width=256, height=128,
                         matrix=CSP.BT_709),
        OutputDescriptor(width=128, height=64, bits=8))
    out = np.asarray(vp.process(_nv12(256, 128)))
    assert out.shape == (3, 64, 128) and np.isfinite(out).all()


def test_jinc2_convert_kernel_small():
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor, VideoProcessor)
    from videorenderer_tpu.config import Upscaling
    from videorenderer_tpu.csputils import CSP
    vp = VideoProcessor(
        Settings(upscaling=Upscaling.JINC2, use_dither=True),
        SourceDescriptor(format=ColorFormat.NV12, width=256, height=128,
                         matrix=CSP.BT_709),
        OutputDescriptor(width=512, height=256, bits=8))
    out = np.asarray(vp.process(_nv12(256, 128)))
    assert out.shape == (3, 256, 512) and np.isfinite(out).all()


def test_serving_rt_scalars_small():
    from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                                   SourceDescriptor)
    from videorenderer_tpu.config import ToneMapType
    from videorenderer_tpu.csputils import CSP, Primaries, TRC
    from videorenderer_tpu.pipeline import (HDR10Metadata, make_serving_fn,
                                            plan_pipeline)
    rng = np.random.default_rng(1)
    planes = (rng.integers(64, 941, (128, 256), np.uint16) << 6,
              rng.integers(64, 961, (64, 128), np.uint16) << 6,
              rng.integers(64, 961, (64, 128), np.uint16) << 6)
    plan = plan_pipeline(
        Settings(convert_to_sdr=False, hdr_passthrough=True,
                 hdr_local_tone_mapping=True,
                 hdr_local_tone_mapping_type=ToneMapType.BT2390,
                 hdr_display_max_nits=600),
        SourceDescriptor(format=ColorFormat.P010, width=256, height=128,
                         matrix=CSP.BT_2020_NC, primaries=Primaries.BT_2020,
                         transfer=TRC.PQ, hdr10=HDR10Metadata()),
        OutputDescriptor(width=256, height=128, bits=10, hdr=True))
    fn = jax.jit(make_serving_fn(plan))
    rt = {"hdr": {"mastering_min_nits": 0.01, "mastering_max_nits": 2000.0,
                  "max_cll": 1500.0, "max_fall": 500.0,
                  "display_max_nits": 650.0}}
    out = np.asarray(fn(planes, rt))
    assert out.shape == (3, 128, 256) and np.isfinite(out).all()
