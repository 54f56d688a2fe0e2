"""Deinterlacing kernels.

The reference delegates deinterlacing to the fixed-function GPU video
processor (rate-conversion caps selection, Source/D3D11VP.cpp:292-331;
past/future reference-frame rings, Source/D3D11VP.h:26-193; second-field
output via ``OutputIndex=1``, Source/D3D11VP.cpp:893-960) with a shader-path
fallback of blend deinterlacing inside the convert shader
(Source/Shaders.cpp:232-237).  Double-rate field output renders two frames
per input sample (Source/DX11VideoProcessor.cpp:2176-2197).

Here the fixed-function block is replaced by explicit kernels:
 * ``bob``        — per-field line doubling with linear interpolation
 * ``weave``      — no-op recombination (progressive content in an
                    interlaced container)
 * ``blend``      — field-average (the reference's shader fallback)
 * ``motion_adaptive`` — weave where static, bob where moving, decided by a
   per-pixel temporal difference against the previous/next frames — the
   explicit analogue of the driver's motion-adaptive rate conversion.

All functions operate on (..., H, W) planes; temporal neighbors are separate
arrays (the pipeline runner maintains the sliding window, mirroring the
reference's ``VideoTextureBuffer`` ring).

Field convention: ``top_field_first=True`` means field 0 occupies even rows
(the top field) and renders first; field 1 (odd rows) renders at
+frame_duration/2, like the reference's second-field pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def _even_rows(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 0::2, :]


def _odd_rows(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 1::2, :]


def _interleave_rows(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """rows: out[2i] = a[i], out[2i+1] = b[i]."""
    stacked = jnp.stack([a, b], axis=-2)          # (..., H/2, 2, W)
    shape = list(a.shape)
    shape[-2] *= 2
    return stacked.reshape(shape)


def bob(frame: jnp.ndarray, field: int, top_field_first: bool = True) -> jnp.ndarray:
    """Line-doubling bob: keep the active field's rows, reconstruct the
    missing rows as the average of vertical neighbors (edge-clamped).

    ``field``: 0 = first temporal field, 1 = second.
    """
    use_top = (field == 0) == top_field_first
    if use_top:
        f = _even_rows(frame)
        # missing odd rows: average of field rows i and i+1 (clamp at bottom)
        nxt = jnp.concatenate([f[..., 1:, :], f[..., -1:, :]], axis=-2)
        return _interleave_rows(f, (f + nxt) * 0.5)
    f = _odd_rows(frame)
    # missing even rows: average of field rows i-1 and i (clamp at top)
    prv = jnp.concatenate([f[..., :1, :], f[..., :-1, :]], axis=-2)
    return _interleave_rows((prv + f) * 0.5, f)


def weave(frame: jnp.ndarray) -> jnp.ndarray:
    """Identity — both fields belong to the same time instant."""
    return frame


def blend(frame: jnp.ndarray) -> jnp.ndarray:
    """Field blend: y' = (2*y[r] + y[r-1] + y[r+1]) / 4, the same math as the
    convert-shader fallback (Source/Shaders.cpp:232-237)."""
    up = jnp.concatenate([frame[..., :1, :], frame[..., :-1, :]], axis=-2)
    down = jnp.concatenate([frame[..., 1:, :], frame[..., -1:, :]], axis=-2)
    return (2.0 * frame + up + down) * 0.25


def motion_adaptive(frame: jnp.ndarray, prev: jnp.ndarray, nxt: jnp.ndarray,
                    field: int, top_field_first: bool = True,
                    threshold: float = 8.0 / 255.0) -> jnp.ndarray:
    """Motion-adaptive deinterlace over a past/future window.

    Where the temporal difference between the *same* field of ``prev`` and
    ``nxt`` is small, weave (full vertical detail); where it is large, fall
    back to bob interpolation.  The soft transition uses a linear ramp of
    width ``threshold`` (motion in [thr, 2*thr] blends weave->bob), which is
    branch-free and vectorizes on the VPU.
    """
    bobbed = bob(frame, field, top_field_first)
    use_top = (field == 0) == top_field_first
    rows = _odd_rows if use_top else _even_rows
    # motion measured on the opposite field rows (the ones we'd weave in)
    motion = jnp.abs(rows(nxt) - rows(prev))
    alpha = jnp.clip((motion - threshold) / threshold, 0.0, 1.0)  # 0=static
    woven_rows = rows(frame)
    bob_rows = rows(bobbed)
    mixed = woven_rows + (bob_rows - woven_rows) * alpha
    if use_top:
        return _interleave_rows(_even_rows(frame), mixed)
    return _interleave_rows(mixed, _odd_rows(frame))


def double_rate_fields(frame: jnp.ndarray, top_field_first: bool = True):
    """Yield the two bob fields for double-rate output
    (Source/DX11VideoProcessor.cpp:2176-2197): field 0 at t, field 1 at
    t + duration/2."""
    return (bob(frame, 0, top_field_first), bob(frame, 1, top_field_first))
