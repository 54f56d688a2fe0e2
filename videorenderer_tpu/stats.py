"""Frame statistics & timing — port of the reference's metrics layer.

Reference equivalents:
 * ``CFrameStats`` — 301-sample timestamp ring with robust average frame
   duration and a 10-frame fast-change detector (Source/FrameStats.h:79-128)
 * ``CDrawStats``  — drawn-fps + drop counters (Source/FrameStats.h:130-143)
 * ``CRenderStats`` — per-stage tick counters copy/paint/present, sync
   offset (Source/FrameStats.h:145-173)
 * ``CMovingAverage`` — sync-offset graph window (Source/FrameStats.h:175-223)
 * ``GetPreciseTick``/QPC (Source/Times.h:23-26)

These are host-side (the TPU analogue of QPC instrumentation around device
dispatches); the stats OSD rendering lives in
:mod:`videorenderer_tpu.osd`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


def precise_tick() -> float:
    """Monotonic seconds (GetPreciseTick analogue)."""
    return time.perf_counter()


class FrameTimestamps:
    """Timestamp ring (CFrameTimestamps, Source/FrameStats.h:28-77)."""

    INTERVAL = 1_000_000_0  # unused placeholder to mirror 1s in 100ns units

    def __init__(self, size: int = 301):
        self._size = size
        self._ts: list[float] = []
        self._frames = 0

    def add(self, ts: float) -> None:
        self._frames += 1
        self._ts.append(ts)
        if len(self._ts) > self._size:
            self._ts.pop(0)

    @property
    def frames(self) -> int:
        return self._frames

    def average_duration(self) -> float:
        """Average over the ring (robust: uses the whole window)."""
        if len(self._ts) < 2:
            return 0.0
        return (self._ts[-1] - self._ts[0]) / (len(self._ts) - 1)

    def fps(self) -> float:
        d = self.average_duration()
        return 1.0 / d if d > 0 else 0.0


class FrameStats(FrameTimestamps):
    """Input-frame statistics with the fast-change detector: if the last 10
    intervals disagree with the long average by >1%, restart the window
    (CFrameStats logic, Source/FrameStats.h:79-128)."""

    CHANGE_FRAMES = 10

    def add(self, ts: float) -> None:
        if len(self._ts) > self.CHANGE_FRAMES:
            recent = self._ts[-self.CHANGE_FRAMES:]
            recent_avg = (recent[-1] - recent[0]) / (len(recent) - 1)
            long_avg = self.average_duration()
            if long_avg > 0 and abs(recent_avg - long_avg) > 0.01 * long_avg:
                self._ts = self._ts[-self.CHANGE_FRAMES:]
        super().add(ts)


@dataclass
class DrawStats:
    """Drawn-frame accounting (CDrawStats, Source/FrameStats.h:130-143)."""

    frames: int = 0
    drops: int = 0
    fails: int = 0
    _ring: FrameTimestamps = field(default_factory=FrameTimestamps)

    def frame_drawn(self, ts: float | None = None) -> None:
        self.frames += 1
        self._ring.add(ts if ts is not None else precise_tick())

    def fps(self) -> float:
        return self._ring.fps()


@dataclass
class RenderStats:
    """Per-stage timing accumulators (CRenderStats,
    Source/FrameStats.h:145-173): seconds spent in host->device copy,
    compute ('paint'), and readback/present, plus failure/skip counters and
    the latest A/V sync offset."""

    copy_s: float = 0.0
    paint_s: float = 0.0
    present_s: float = 0.0
    failed: int = 0
    dropped2: int = 0
    skipped_interval: int = 0
    sync_offset_s: float = 0.0

    def reset(self) -> None:
        self.copy_s = self.paint_s = self.present_s = 0.0
        self.failed = self.dropped2 = self.skipped_interval = 0
        self.sync_offset_s = 0.0


class MovingAverage:
    """Fixed-window moving average for the sync-offset graph
    (CMovingAverage, Source/FrameStats.h:175-223)."""

    def __init__(self, size: int):
        self._vals = [0.0] * size
        self._i = 0
        self._sum = 0.0
        self._filled = 0

    def add(self, v: float) -> None:
        self._sum += v - self._vals[self._i]
        self._vals[self._i] = v
        self._i = (self._i + 1) % len(self._vals)
        self._filled = min(self._filled + 1, len(self._vals))

    def average(self) -> float:
        return self._sum / max(1, self._filled)

    def values(self) -> list[float]:
        """Window contents in chronological order (for the graph polyline)."""
        return self._vals[self._i:] + self._vals[:self._i]


@dataclass
class Metrics:
    """The bundle a processor/session exposes (IQualProp analogue,
    renbase2.h:206-211 — drawn frames, avg frame rate, jitter, sync
    offsets — plus the stats-OSD fields)."""

    input_stats: FrameStats = field(default_factory=FrameStats)
    draw_stats: DrawStats = field(default_factory=DrawStats)
    render_stats: RenderStats = field(default_factory=RenderStats)
    sync_graph: MovingAverage = field(default_factory=lambda: MovingAverage(120))

    def snapshot(self) -> dict:
        return {
            "input_fps": self.input_stats.fps(),
            "draw_fps": self.draw_stats.fps(),
            "frames_drawn": self.draw_stats.frames,
            "frames_dropped": self.draw_stats.drops,
            "frames_failed": self.render_stats.failed,
            "copy_ms": self.render_stats.copy_s * 1e3,
            "paint_ms": self.render_stats.paint_s * 1e3,
            "present_ms": self.render_stats.present_s * 1e3,
            "sync_offset_ms": self.render_stats.sync_offset_s * 1e3,
            "avg_sync_offset_ms": self.sync_graph.average() * 1e3,
        }
