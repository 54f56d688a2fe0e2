"""Device-side packed-format unpacking (v210 / Y210 / biplanar UV split).

The host-side numpy/C++ repack (videorenderer_tpu/formats.py, native/) is
fine for file workflows, but a production ingest path wants the *packed*
bytes shipped to HBM (smallest transfer) and unpacked on device.  These are
int-twiddling VPU ops; XLA compiles them into a couple of fused kernels —
the TPU equivalent of the reference's SIMD repack running on the GPU-copy
side instead of the CPU (Source/Helper.cpp:703-760 CopyFrameV210,
Source/DX11VideoProcessor.cpp:1213-1252 plane binding).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def v210_unpack_device(dwords: jnp.ndarray, width: int):
    """(..., row_dwords) uint32 v210 rows -> (Y, U, V) uint16 MSB-aligned
    planes ((..., W), (..., W/2), (..., W/2)).

    v210 packs 6 pixels per 4 dwords with the component sequence
    U0 Y0 V0 | Y1 U2 Y2 | V2 Y3 U4 | Y4 V4 Y5 (10 bits each, little-endian).
    """
    lead = dwords.shape[:-1]
    row_dwords = dwords.shape[-1]
    groups = row_dwords // 4
    d = dwords.reshape(lead + (groups, 4))
    c0 = (d & 0x3FF).astype(jnp.uint16) << 6
    c1 = ((d >> 10) & 0x3FF).astype(jnp.uint16) << 6
    c2 = ((d >> 20) & 0x3FF).astype(jnp.uint16) << 6

    y = jnp.stack([c1[..., 0], c0[..., 1], c2[..., 1],
                   c1[..., 2], c0[..., 3], c2[..., 3]], axis=-1)
    u = jnp.stack([c0[..., 0], c1[..., 1], c2[..., 2]], axis=-1)
    v = jnp.stack([c2[..., 0], c0[..., 2], c1[..., 3]], axis=-1)
    y = y.reshape(lead + (groups * 6,))[..., :width]
    u = u.reshape(lead + (groups * 3,))[..., :width // 2]
    v = v.reshape(lead + (groups * 3,))[..., :width // 2]
    return y, u, v


def y210_unpack_device(words: jnp.ndarray, width: int):
    """(..., W*2) uint16 Y210/Y216 rows (Y0 U Y1 V) -> (Y, U, V) planes."""
    lead = words.shape[:-1]
    q = words.reshape(lead + (width // 2, 4))
    y = q[..., 0::2].reshape(lead + (width,))
    return y, q[..., 1], q[..., 3]


def nv12_split_device(buf: jnp.ndarray, width: int, height: int):
    """(..., H*W*3/2) uint8/uint16 NV12/P010 buffer -> (Y, U, V) planes."""
    lead = buf.shape[:-1]
    ysize = width * height
    y = buf[..., :ysize].reshape(lead + (height, width))
    uv = buf[..., ysize:].reshape(lead + (height // 2, width // 2, 2))
    return y, uv[..., 0], uv[..., 1]
