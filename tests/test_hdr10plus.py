"""HDR10+ (ST 2094-40) metadata consumption.

The reference only defines MediaSideDataHDR10Plus
(Include/IMediaSideData.h:67-130); here the scene statistics drive the
local tone map like DoVi L1 does, plus the 2094-40 basis curve itself.
"""

import numpy as np
import jax.numpy as jnp

from videorenderer_tpu.ops.hdr10plus import (HDR10PlusMetadata,
                                             HDR10PlusWindow,
                                             apply_hdr10plus_curve,
                                             hdr_params_from_hdr10plus,
                                             merge_hdr10,
                                             runtime_hdr_from_hdr10plus,
                                             scene_peak_nits)
from videorenderer_tpu.pipeline import (HDR10Metadata, OutputDescriptor,
                                        SourceDescriptor, plan_pipeline)
from videorenderer_tpu import ColorFormat, Settings
from videorenderer_tpu.csputils import CSP, Levels, Primaries, TRC


def _meta(peak_frac=0.2, avg_frac=0.02, pct=None):
    w = HDR10PlusWindow(maxscl=(peak_frac, peak_frac * 0.9, peak_frac * 0.8),
                        average_maxrgb=avg_frac,
                        distribution_maxrgb=pct or ())
    return HDR10PlusMetadata(windows=(w,))


def test_scene_peak_from_maxscl_and_percentile():
    assert scene_peak_nits(_meta(0.2)) == 2000.0
    # the 99.98% percentile wins when present
    m = _meta(0.2, pct=((50, 0.01), (99, 0.15)))
    assert scene_peak_nits(m) == 1500.0


def test_hdr_params_substitution():
    h = HDR10Metadata(mastering_max_nits=4000.0, max_cll=4000.0)
    p, t = hdr_params_from_hdr10plus(_meta(0.12, 0.03), h, 800.0, 5)
    assert p.mastering_max_nits == 1200.0          # scene peak, not static
    assert p.max_cll == 1200.0
    assert p.max_fall == 300.0
    assert p.display_max_nits == 800.0
    assert t == 5
    # empty metadata falls back to the static HDR10 block
    p2, _ = hdr_params_from_hdr10plus(HDR10PlusMetadata(
        windows=(HDR10PlusWindow(),)), h, 800.0, 5)
    assert p2.mastering_max_nits == 4000.0


def test_merge_and_runtime_dict():
    h = HDR10Metadata(max_cll=1000.0, max_fall=400.0)
    out = merge_hdr10(h, _meta(0.3, 0.06))
    assert out.max_cll == 3000.0 and out.max_fall == 600.0
    rt = runtime_hdr_from_hdr10plus(_meta(0.1), h, 1000.0)
    assert float(rt["mastering_max_nits"]) == 1000.0
    assert set(rt) == {"mastering_min_nits", "mastering_max_nits",
                       "max_cll", "max_fall", "display_max_nits"}


def test_plan_consumes_hdr10plus():
    src = SourceDescriptor(
        format=ColorFormat.P010, width=64, height=32,
        matrix=CSP.BT_2020_NC, primaries=Primaries.BT_2020, transfer=TRC.PQ,
        hdr10=HDR10Metadata(mastering_max_nits=4000.0),
        hdr10plus=_meta(0.15, 0.04))
    plan = plan_pipeline(Settings(hdr_local_tone_mapping=True,
                                  convert_to_sdr=False,
                                  hdr_display_max_nits=600),
                         src, OutputDescriptor(width=64, height=32,
                                               bits=10, hdr=True))
    assert plan.tonemap_params.mastering_max_nits == 1500.0
    assert plan.output_hdr10.max_cll == 1500.0


def test_basis_curve_properties():
    """Knee continuity, endpoint mapping and monotonicity of the 2094-40
    guided curve."""
    w = HDR10PlusWindow(tone_mapping_flag=1, knee_point_x=0.25,
                        knee_point_y=0.4,
                        bezier_curve_anchors=(0.45, 0.7, 0.85, 0.94))
    x = jnp.linspace(0.0, 1.0, 401)
    y = np.asarray(apply_hdr10plus_curve(x, w))
    assert abs(y[0]) < 1e-6
    assert abs(y[-1] - 1.0) < 1e-6
    k = int(0.25 * 400)
    np.testing.assert_allclose(y[k], 0.4, atol=1e-3)   # knee lands on ky
    assert np.all(np.diff(y) > -1e-6)                  # monotone
    # disabled flag is the identity
    w0 = HDR10PlusWindow(tone_mapping_flag=0)
    np.testing.assert_array_equal(np.asarray(apply_hdr10plus_curve(x, w0)),
                                  np.asarray(x))
