"""Clip runner: batched, double-buffered frame streaming with temporal state.

The reference's streaming loop (Receive -> CopySample -> Render -> Present,
Source/DX11VideoProcessor.cpp:2143-2200) overlaps CPU upload with GPU work
through the swap-chain queue.  The TPU analogue:

 * frames are processed in **batches** (clips) — throughput over latency;
 * host->device transfer of batch k+1 is issued (``jax.device_put`` is
   async) while batch k computes — the copy/paint overlap;
 * deinterlacing keeps a past/future frame window across batch boundaries
   (the reference's reference-frame ring, Source/D3D11VP.h:26-193) by
   overlapping consecutive batches with 1-frame halos;
 * A/V-sync accounting (drop-late-frame logic, renbase2.h:46-68 /
   SyncFrameToStreamTime, Source/VideoProcessor.cpp:258-271) is reproduced
   for real-time mode in :class:`PresentClock`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .stats import Metrics, precise_tick


@dataclass
class ClipResult:
    outputs: list           # list of device arrays (one per batch)
    frames: int
    seconds: float

    @property
    def fps(self) -> float:
        return self.frames / self.seconds if self.seconds > 0 else 0.0


def run_clip(frame_fn: Callable, batches: Iterable[tuple], device=None,
             metrics: Metrics | None = None) -> ClipResult:
    """Stream plane-batches through a jitted frame function with transfer/
    compute overlap.

    ``batches``: iterable of plane tuples (numpy arrays, leading batch dim).
    """
    device = device or jax.devices()[0]
    fn = frame_fn
    outputs = []
    n_frames = 0
    it = iter(batches)

    def put(b):
        return tuple(jax.device_put(p, device) for p in b)

    t0 = precise_tick()
    try:
        current = put(next(it))
    except StopIteration:
        return ClipResult([], 0, 0.0)

    while True:
        # issue next transfer before waiting on compute (async dispatch)
        nxt = next(it, None)
        pending = put(nxt) if nxt is not None else None
        out = fn(current)
        outputs.append(out)
        n_frames += current[0].shape[0] if current[0].ndim > 2 else 1
        if metrics is not None:
            metrics.draw_stats.frame_drawn()
        if pending is None:
            break
        current = pending
    jax.block_until_ready(outputs[-1])
    return ClipResult(outputs, n_frames, precise_tick() - t0)


def windowed_batches(planes: tuple[np.ndarray, ...], batch: int,
                     halo: int = 0) -> Iterator[tuple]:
    """Split (N, ...) plane arrays into batches with ``halo`` overlap frames
    on each side (temporal window for motion-adaptive deinterlacing)."""
    n = planes[0].shape[0]
    for start in range(0, n, batch):
        lo = max(0, start - halo)
        hi = min(n, start + batch + halo)
        yield tuple(p[lo:hi] for p in planes)


class DeinterlaceSession:
    """Streaming motion-adaptive deinterlacing with one frame of lookahead —
    the reference-frame window of the fixed-function deinterlacer
    (Source/D3D11VP.h:26-193) as a host-side sliding buffer.

    push() returns 0..2 processed output frames per input (2 when
    ``double_rate`` — field 1 is the +duration/2 render); flush() drains the
    last frame with a clamped window.
    """

    def __init__(self, plan, double_rate: bool = True,
                 top_field_first: bool = True, pack_surface: bool = False):
        import jax as _jax
        from .pipeline import make_deint_fields_fn, make_deint_frame_fn
        self.double_rate = double_rate
        if double_rate:
            # one program for both fields: casts + motion field shared
            self._dual = _jax.jit(make_deint_fields_fn(
                plan, top_field_first=top_field_first,
                pack_surface=pack_surface))
            self._fns = []
        else:
            self._dual = None
            self._fns = [_jax.jit(make_deint_frame_fn(
                plan, field=0, top_field_first=top_field_first,
                pack_surface=pack_surface))]
        self._window: list[tuple] = []  # [prev, cur, next]
        self._tail: tuple | None = None  # batched mode: last 2 stream frames

    def _emit(self, prev, cur, nxt) -> list:
        if self._dual is not None:
            return list(self._dual(prev, cur, nxt))
        return [fn(prev, cur, nxt) for fn in self._fns]

    def push(self, planes: tuple) -> list:
        if self._tail is not None:
            raise RuntimeError("this session is in batched mode "
                               "(push_batch/flush_batch); do not mix APIs")
        planes = tuple(jnp.asarray(p) for p in planes)
        self._window.append(planes)
        if len(self._window) == 1:
            return []
        if len(self._window) == 2:
            # first frame: prev clamps to itself
            a, b = self._window
            return self._emit(a, a, b)
        self._window = self._window[-3:]
        a, b, c = self._window
        return self._emit(a, b, c)

    def flush(self) -> list:
        if self._tail is not None:
            raise RuntimeError("this session is in batched mode; "
                               "use flush_batch()")
        if not self._window:
            return []
        if len(self._window) == 1:
            a = self._window[0]
            return self._emit(a, a, a)
        a, b = self._window[-2:]
        return self._emit(a, b, b)

    # -- batched streaming ---------------------------------------------------
    # Frame-at-a-time push() renders the whole pipeline at batch 1, where
    # per-dispatch overheads dominate at 4K.  The batched variant keeps the
    # same per-frame math (identical sliding window, same clamping) but
    # builds shifted (prev, cur, next) batch views and runs ONE jitted call
    # per field per batch.  Use either push() or push_batch(), not both.

    def push_batch(self, planes: tuple) -> list:
        """``planes``: plane arrays with a leading frame dim (B, ...).
        Returns per-field output batches covering every input frame whose
        one-frame lookahead is available (the rest emit on the next call or
        flush_batch()).  With ``double_rate`` the presentation order
        interleaves field 0 and field 1 of each frame."""
        if self._window:
            raise RuntimeError("this session is in streaming mode "
                               "(push/flush); do not mix APIs")
        planes = tuple(jnp.asarray(p) for p in planes)
        if self._tail is None:
            # stream start: the first frame's prev clamps to itself
            arr = tuple(jnp.concatenate([p[:1], p]) for p in planes)
        else:
            arr = tuple(jnp.concatenate([t, p])
                        for t, p in zip(self._tail, planes))
        m = arr[0].shape[0]
        outs = []
        if m >= 3:
            prev = tuple(p[0:m - 2] for p in arr)
            cur = tuple(p[1:m - 1] for p in arr)
            nxt = tuple(p[2:m] for p in arr)
            outs = self._emit(prev, cur, nxt)
        self._tail = tuple(p[-2:] for p in arr)
        return outs

    def flush_batch(self) -> list:
        """Drain the final frame (next clamps to the last frame)."""
        if self._window:
            raise RuntimeError("this session is in streaming mode; "
                               "use flush()")
        if self._tail is None:
            return []
        prev = tuple(p[0:1] for p in self._tail)
        cur = tuple(p[1:2] for p in self._tail)
        self._tail = None
        return self._emit(prev, cur, cur)


class PresentClock:
    """Real-time presentation pacing: decides drop/render per frame like the
    base renderer's quality management (renbase2.h:46-148) and sleeps to the
    stream time (SyncFrameToStreamTime, Source/VideoProcessor.cpp:258-271)."""

    def __init__(self, fps: float, adjust_present_time: bool = True):
        self.frame_duration = 1.0 / fps
        self.adjust = adjust_present_time
        self.start: float | None = None
        self.dropped = 0
        self.rendered = 0

    def should_drop(self, frame_index: int) -> bool:
        """True if the frame's presentation time has already passed by more
        than one frame duration (drop-if-late,
        Source/DX11VideoProcessor.cpp:2176-2197)."""
        if self.start is None:
            self.start = precise_tick()
            return False
        due = self.start + frame_index * self.frame_duration
        late = precise_tick() - due
        if late > self.frame_duration:
            self.dropped += 1
            return True
        return False

    def wait_for(self, frame_index: int) -> float:
        """Sleep until the frame is due; returns the sync offset (s)."""
        if self.start is None:
            self.start = precise_tick()
        due = self.start + frame_index * self.frame_duration
        now = precise_tick()
        if self.adjust and due > now:
            time.sleep(due - now)
        self.rendered += 1
        return precise_tick() - due
