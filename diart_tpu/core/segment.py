"""Time segments, sliding windows and windowed features.

Self-contained equivalents of the ``pyannote.core`` structures the reference
framework builds on (see reference usage in ``/root/reference/src/diart/
blocks/aggregation.py`` and ``operators.py``). Only the semantics actually
exercised by the streaming diarization stack are implemented, but those are
implemented *exactly* — in particular the ``crop`` index arithmetic, which
determines bit-level parity of aggregated outputs.

Crop semantics (mirroring pyannote.core.SlidingWindow.crop):

A sliding window has frames ``[start + i*step, start + i*step + duration]``.
Cropping a focus segment ``[fs, fe]`` selects a contiguous frame range:

* ``loose``  — frames intersecting the focus:
  ``i = ceil((fs - duration - start) / step)``; with a ``fixed`` duration the
  number of frames is ``floor((fixed + duration) / step)``.
* ``strict`` — frames fully contained in the focus:
  ``i = ceil((fs - start) / step)``; with ``fixed``,
  ``n = floor((fixed - duration) / step) + 1``.
* ``center`` — frames whose center lies in the focus:
  ``i = ceil((fs - start - duration/2) / step)``; with ``fixed``,
  ``n = rint(fixed / step)``.

Out-of-range frames are padded by repeating the first/last frame, matching
``pyannote.core.SlidingWindowFeature.crop``'s repeat-padding behaviour that
the reference relies on for its first-chunk prepend
(``/root/reference/src/diart/blocks/aggregation.py:188-212``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["Segment", "SlidingWindow", "SlidingWindowFeature"]


def _r(x: float) -> float:
    """Round to 10 decimals before flooring/ceiling frame indices.

    Frame boundaries regularly land on exact integers (e.g. the aggregation
    focus of a 5 s / 293-frame chunk at 1 s latency); raw float arithmetic
    would make the selected index depend on accumulated timestamp noise. The
    guard keeps crop indices t-invariant so the host-exact path and the
    static-index device path select identical frames.
    """
    return round(x, 10)

@dataclass(frozen=True, order=True)
class Segment:
    """A time interval ``[start, end)`` in seconds."""

    start: float = 0.0
    end: float = 0.0

    @property
    def duration(self) -> float:
        return self.end - self.start if self.end > self.start else 0.0

    @property
    def middle(self) -> float:
        return 0.5 * (self.start + self.end)

    def __bool__(self) -> bool:
        return bool(self.end - self.start > 0)

    def intersects(self, other: "Segment") -> bool:
        return self.start < other.end and other.start < self.end

    def overlaps(self, t: float) -> bool:
        return self.start <= t <= self.end

    def __and__(self, other: "Segment") -> "Segment":
        """Intersection (may be empty)."""
        return Segment(max(self.start, other.start), min(self.end, other.end))

    def __or__(self, other: "Segment") -> "Segment":
        """Hull of both segments."""
        if not self:
            return other
        if not other:
            return self
        return Segment(min(self.start, other.start), max(self.end, other.end))

    def __contains__(self, other: "Segment") -> bool:
        return self.start <= other.start and self.end >= other.end

    def gap(self, other: "Segment") -> float:
        """Gap duration between two disjoint segments (<=0 if overlapping)."""
        if self.start < other.start:
            return other.start - self.end
        return self.start - other.end

    def __str__(self) -> str:
        return f"[{self.start:.3f} --> {self.end:.3f}]"


class SlidingWindow:
    """Regular frame grid: frame ``i`` covers ``[start+i*step, +duration]``."""

    def __init__(
        self,
        duration: float = 0.030,
        step: float = 0.010,
        start: float = 0.0,
        end: Optional[float] = None,
    ):
        if duration <= 0:
            raise ValueError("duration must be positive")
        if step <= 0:
            raise ValueError("step must be positive")
        self.duration = float(duration)
        self.step = float(step)
        self.start = float(start)
        self.end = end if end is None else float(end)

    def __getitem__(self, i: int) -> Segment:
        t0 = self.start + i * self.step
        return Segment(t0, t0 + self.duration)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, SlidingWindow)
            and self.duration == other.duration
            and self.step == other.step
            and self.start == other.start
        )

    def samples(self, from_duration: float, mode: str = "strict") -> int:
        """Number of frames in a span of ``from_duration`` seconds."""
        if mode == "strict":
            return int(math.floor(_r((from_duration - self.duration) / self.step))) + 1
        if mode == "loose":
            return int(math.floor(_r((from_duration + self.duration) / self.step)))
        if mode == "center":
            return int(np.rint(_r(from_duration / self.step)))
        raise ValueError(f"unknown mode {mode!r}")

    def crop_range(
        self,
        focus: Segment,
        mode: str = "loose",
        fixed: Optional[float] = None,
    ) -> Tuple[int, int]:
        """Frame index range ``[i, j)`` selected by cropping ``focus``.

        Indices may exceed the bounds of an associated feature buffer; it is
        the feature's job to pad (see :meth:`SlidingWindowFeature.crop`).
        """
        if mode == "loose":
            i = int(math.ceil(_r((focus.start - self.duration - self.start) / self.step)))
            if fixed is None:
                j = int(math.floor(_r((focus.end - self.start) / self.step)))
                return i, j + 1
            return i, i + self.samples(fixed, mode="loose")
        if mode == "strict":
            i = int(math.ceil(_r((focus.start - self.start) / self.step)))
            if fixed is None:
                j = int(
                    math.floor(_r((focus.end - self.duration - self.start) / self.step))
                )
                return i, j + 1
            return i, i + self.samples(fixed, mode="strict")
        if mode == "center":
            # Frame whose *center* is closest to the focus bound (np.rint),
            # matching pyannote.core's closest_frame semantics — ceil/floor
            # here would shift center crops by one frame relative to the
            # reference for half-step-offset focuses.
            i = self.closest_frame(focus.start)
            if fixed is None:
                j = self.closest_frame(focus.end)
                return i, j + 1
            return i, i + self.samples(fixed, mode="center")
        raise ValueError(f"unknown mode {mode!r}")

    def closest_frame(self, t: float) -> int:
        return int(np.rint((t - self.start - 0.5 * self.duration) / self.step))

    def __iter__(self) -> Iterator[Segment]:
        if self.end is None:
            raise ValueError("cannot iterate over an unbounded sliding window")
        i = 0
        while True:
            seg = self[i]
            if seg.start >= self.end:
                return
            yield seg
            i += 1


class SlidingWindowFeature:
    """A ``(frames, dims)`` array whose rows sit on a :class:`SlidingWindow`."""

    def __init__(self, data: np.ndarray, sliding_window: SlidingWindow):
        self.data = np.asarray(data)
        self.sliding_window = sliding_window

    @property
    def extent(self) -> Segment:
        """Span from the start of the first frame to the end of the last."""
        num_frames = self.data.shape[0]
        sw = self.sliding_window
        return Segment(sw.start, sw.start + (num_frames - 1) * sw.step + sw.duration)

    def __len__(self) -> int:
        return self.data.shape[0]

    def __getitem__(self, item):
        return self.data[item]

    def crop(
        self,
        focus: Segment,
        mode: str = "loose",
        fixed: Optional[float] = None,
    ) -> np.ndarray:
        """Crop to a focus segment; out-of-range rows repeat the edge rows.

        Matches ``pyannote.core.SlidingWindowFeature.crop`` with
        ``return_data=True``: indices below 0 repeat the first row and indices
        beyond the last frame repeat the last row, which the reference's
        aggregation layer depends on.
        """
        i, j = self.sliding_window.crop_range(focus, mode=mode, fixed=fixed)
        n = self.data.shape[0]
        if n == 0:
            raise ValueError("cannot crop an empty feature")
        idx = np.clip(np.arange(i, j), 0, n - 1)
        return self.data[idx]

    def crop_indices(
        self,
        focus: Segment,
        mode: str = "loose",
        fixed: Optional[float] = None,
    ) -> np.ndarray:
        """Clipped frame indices used by :meth:`crop` (useful to build static
        gather maps for the on-device aggregation kernels)."""
        i, j = self.sliding_window.crop_range(focus, mode=mode, fixed=fixed)
        return np.clip(np.arange(i, j), 0, self.data.shape[0] - 1)
