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
