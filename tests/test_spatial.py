"""Spatially-sharded pipeline vs the single-device fused pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from videorenderer_tpu import (ColorFormat, OutputDescriptor, Settings,
                               SourceDescriptor)
from videorenderer_tpu.csputils import CSP
from videorenderer_tpu.config import Upscaling
from videorenderer_tpu.parallel.spatial import (make_spatial_frame_fn,
                                                required_halo,
                                                shard_planes_rows)
from videorenderer_tpu.pipeline import make_frame_fn, plan_pipeline
from videorenderer_tpu.ops import scale


def test_required_halo():
    mat = scale.upscale_matrix(Upscaling.LANCZOS3, 64, 128)
    h = required_halo(np.asarray(mat), 4)
    assert 1 <= h <= 8
    mat2 = scale.upscale_matrix(Upscaling.LANCZOS3, 128, 64)
    h2 = required_halo(np.asarray(mat2), 4)
    assert h2 >= 1


@pytest.mark.parametrize("out_size", [(64, 128), (32, 32), (128, 256)])
def test_spatial_matches_single(out_size):
    oh, ow = out_size
    w, h = 64, 64
    mesh = Mesh(np.array(jax.devices()[:4]), ("spatial",))
    src = SourceDescriptor(format=ColorFormat.NV12, width=w, height=h,
                           matrix=CSP.BT_709)
    dst = OutputDescriptor(width=ow, height=oh, bits=8)
    plan = plan_pipeline(Settings(use_dither=False), src, dst)

    rng = np.random.default_rng(0)
    planes = (rng.integers(0, 256, (h, w), np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), np.uint8))

    ref = np.asarray(jax.jit(make_frame_fn(plan))(planes))
    sharded = shard_planes_rows(mesh, tuple(jnp.asarray(p) for p in planes))
    fn = jax.jit(make_spatial_frame_fn(plan, mesh))
    got = np.asarray(fn(sharded))
    np.testing.assert_allclose(got, ref, atol=3e-6)


def test_spatial_dither_and_hdr():
    from videorenderer_tpu.csputils import Levels, Primaries, TRC
    mesh = Mesh(np.array(jax.devices()[:2]), ("spatial",))
    w, h = 64, 32
    src = SourceDescriptor(format=ColorFormat.P010, width=w, height=h,
                           matrix=CSP.BT_2020_NC, levels=Levels.TV,
                           primaries=Primaries.BT_2020, transfer=TRC.PQ)
    dst = OutputDescriptor(width=32, height=16, bits=10)
    plan = plan_pipeline(Settings(upscaling=Upscaling.LANCZOS3), src, dst)
    rng = np.random.default_rng(1)
    planes = (rng.integers(64, 941, (h, w), np.uint16) << 6,
              rng.integers(64, 961, (h // 2, w // 2), np.uint16) << 6,
              rng.integers(64, 961, (h // 2, w // 2), np.uint16) << 6)
    ref = np.asarray(jax.jit(make_frame_fn(plan))(planes))
    got = np.asarray(jax.jit(make_spatial_frame_fn(plan, mesh))(
        shard_planes_rows(mesh, tuple(jnp.asarray(p) for p in planes))))
    # quantized 10-bit output: allow isolated code flips at boundaries
    diff = np.abs(got - ref)
    assert (diff > 0.5 / 1023).mean() < 5e-3
