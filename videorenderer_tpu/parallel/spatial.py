"""Spatially-sharded frame processing: one frame split across chips by rows.

For frames too large for one chip's real-time budget (8K+, or very deep
batches), the frame's rows are sharded over the mesh.  Every pipeline stage
is row-local except the vertical (H-axis) contractions — chroma upsample,
blend-deinterlace and resize — which need ``halo`` input rows from the
neighbor shards; those are exchanged with ``jax.lax.ppermute`` over ICI
inside ``shard_map`` (see :func:`videorenderer_tpu.parallel.mesh.halo_exchange`).

This is the framework's "sequence parallelism" analogue (SURVEY.md §5): the
support radius of each separable filter is static, so the halo is exact and
the collective volume is a few rows per shard per stage.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats import ColorSystem
from ..ops import scale as scale_ops
from ..pipeline import (PipelinePlan, _can_fuse, _compose, _corrections,
                        _final_pass, _local_tonemap)
from ..ops import chroma as chroma_ops
from .mesh import spatial_resize_rows


def required_halo(mat: np.ndarray, n_shards: int) -> int:
    """Exact halo rows needed so each output shard's rows only reference its
    input shard ± halo."""
    h_in, h_out = mat.shape
    assert h_in % n_shards == 0 and h_out % n_shards == 0
    hs_in, hs_out = h_in // n_shards, h_out // n_shards
    halo = 0
    nz_r, nz_c = np.nonzero(mat)
    for r, m in zip(nz_r, nz_c):
        i = m // hs_out
        halo = max(halo, i * hs_in - r, (r + 1) - (i + 1) * hs_in)
    return int(halo)


def make_spatial_frame_fn(plan: PipelinePlan, mesh: Mesh,
                          axis: str = "spatial", dtype=jnp.float32):
    """Row-sharded version of the fused pipeline.

    Input planes are (..., H, W) sharded on H over ``mesh[axis]``; output is
    (..., 3, H_out, W_out) sharded the same way.  Requires a fusable plan
    (see pipeline._can_fuse) and H dims divisible by the mesh size.
    """
    if not _can_fuse(plan):
        raise ValueError("spatial sharding requires a fusable (linear-prefix) plan")
    s = plan.settings
    src, dst = plan.src, plan.dst
    info = plan.info
    n = mesh.shape[axis]

    cx = scale_ops.select_scaler(src.width, dst.width, s.upscaling,
                                 s.downscaling, s.interpolate_at_50pct)
    cy = scale_ops.select_scaler(src.height, dst.height, s.upscaling,
                                 s.downscaling, s.interpolate_at_50pct)
    wx = scale_ops.build_axis_matrix(cx, src.width, dst.width)
    wy = scale_ops.build_axis_matrix(cy, src.height, dst.height)
    if wy is None:
        wy = np.eye(src.height)
    wy_luma = wy
    if (s.deint_blend and src.interlaced and info.subsampling == 420
            and info.cs_type == ColorSystem.YUV):
        wy_luma = _compose(chroma_ops.blend_deinterlace_matrix(src.height), wy)

    if info.cs_type == ColorSystem.YUV:
        dw, dh = info.chroma_div
        ux, uy = chroma_ops.chroma_upsample_matrices(
            src.width // dw, src.height // dh, info.subsampling,
            s.chroma_scaling, src.chroma_location)
        cwx = _compose(ux, wx)
        cwy = _compose(uy, wy) if uy is not None else wy
        if cwy is None:
            cwy = np.eye(src.height // dh)
    else:
        cwx, cwy = wx, wy

    norm = 1.0 / (2.0 ** info.plane_bits - 1.0)
    halo_y = required_halo(np.asarray(wy_luma), n)
    halo_c = required_halo(np.asarray(cwy), n)

    def shard_fn(*planes):
        def apply2d(p, mx, my, halo):
            x = p.astype(dtype) * jnp.asarray(norm, dtype)
            if mx is not None:
                x = scale_ops.resize_axis(x, mx, -1)
            return spatial_resize_rows(x, np.asarray(my), halo, axis)

        if info.cs_type == ColorSystem.GRAY:
            y = apply2d(planes[0], wx, wy, halo_y)
            m, c = plan.cmat_m, plan.cmat_c
            rgb = jnp.stack([y * m[i, 0] + c[i] for i in range(3)], axis=-3)
        else:
            if info.cs_type == ColorSystem.YUV:
                comps = (apply2d(planes[0], wx, wy_luma, halo_y),
                         apply2d(planes[1], cwx, cwy, halo_c),
                         apply2d(planes[2], cwx, cwy, halo_c))
            else:
                comps = tuple(apply2d(p, wx, wy, halo_y) for p in planes)
            if plan.apply_matrix:
                m = jnp.asarray(plan.cmat_m, dtype)
                c = jnp.asarray(plan.cmat_c, dtype)
                rgb = jnp.stack(
                    [m[i, 0] * comps[0] + m[i, 1] * comps[1]
                     + m[i, 2] * comps[2] + c[i] for i in range(3)], axis=-3)
            else:
                rgb = jnp.stack(comps, axis=-3)
        rgb = _corrections(plan, rgb)
        if plan.local_tonemap:
            rgb = _local_tonemap(plan, rgb)
        return _final_pass(plan, rgb)

    from jax.experimental.shard_map import shard_map

    # planes are (..., H, W): shard the H axis (second-to-last)
    def spec_for(ndim):
        parts = [None] * ndim
        parts[-2] = axis
        return P(*parts)

    def fn(planes):
        specs = tuple(spec_for(p.ndim) for p in planes)
        out_spec = spec_for(planes[0].ndim + 1)
        smfn = shard_map(shard_fn, mesh=mesh, in_specs=specs,
                         out_specs=out_spec)
        return smfn(*planes)

    return fn


def shard_planes_rows(mesh: Mesh, planes, axis: str = "spatial"):
    """Place (..., H, W) plane arrays with H sharded over the mesh."""
    def put(x):
        parts = [None] * x.ndim
        parts[-2] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*parts)))
    return tuple(put(p) for p in planes)
