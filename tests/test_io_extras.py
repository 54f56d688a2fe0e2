"""Image export + SRT parsing tests."""

import numpy as np

from videorenderer_tpu.io.image import save_bmp, save_image
from videorenderer_tpu.io.srt import parse_srt


def test_bmp_roundtrip(tmp_path):
    rgb = np.random.default_rng(0).integers(0, 256, (7, 5, 3), np.uint8)
    p = tmp_path / "x.bmp"
    save_bmp(str(p), rgb)
    from PIL import Image
    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, rgb)


def test_save_png(tmp_path):
    rgb = np.zeros((4, 4, 3), np.float32)
    rgb[..., 0] = 1.0
    p = tmp_path / "y.png"
    save_image(str(p), rgb)
    from PIL import Image
    back = np.asarray(Image.open(p))
    assert back[0, 0, 0] == 255 and back[0, 0, 1] == 0


def test_parse_srt():
    text = """1
00:00:01,000 --> 00:00:03,500
Hello <i>world</i>

2
00:01:00,250 --> 00:01:02,000
Second line
{with override}
"""
    evs = parse_srt(text)
    assert len(evs) == 2
    assert evs[0].start == 1.0 and evs[0].stop == 3.5
    assert evs[0].text == "Hello world"
    assert evs[1].start == 60.25
    assert "override" not in evs[1].text


def test_parse_srt_no_index_and_dot_ms():
    evs = parse_srt("00:00:00.500 --> 00:00:01.000\nhi")
    assert len(evs) == 1 and evs[0].start == 0.5
