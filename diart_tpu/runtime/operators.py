"""Stream operators: sliding-window re-chunking and output accumulation.

Parity targets in ``/root/reference/src/diart/operators.py``:
``rearrange_audio_stream`` (``:44-100``) — a scan-based re-chunker turning
arbitrary-sized sample blocks into (duration, step) sliding windows with
start-time tracking; ``accumulate_output`` (``:147-212``) — unbounded
annotation+audio accumulation with an amortized doubling buffer;
``buffer_output`` (``:215-304``) — fixed-size rolling buffer for live plots.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Optional

import numpy as np

from ..core.annotation import Annotation
from ..core.segment import Segment, SlidingWindow, SlidingWindowFeature
from .rx import Observable, ops

Operator = Callable[[Observable], Observable]

__all__ = [
    "AudioBufferState",
    "rearrange_audio_stream",
    "buffer_slide",
    "accumulate_output",
    "buffer_output",
    "OutputAccumulationState",
]


@dataclass
class AudioBufferState:
    """Scan state of the re-chunker: current chunk, pending buffer, chunk
    start time, and whether the chunk changed on the last block."""

    chunk: Optional[np.ndarray]
    buffer: Optional[np.ndarray]
    start_time: float
    changed: bool

    @staticmethod
    def initial() -> "AudioBufferState":
        return AudioBufferState(None, None, 0.0, False)


def rearrange_audio_stream(
    duration: float = 5.0, step: float = 0.5, sample_rate: int = 16000
) -> Operator:
    """Re-chunk arbitrary (1, n) sample blocks into overlapping sliding
    windows of ``duration`` seconds every ``step`` seconds."""
    chunk_samples = int(round(sample_rate * duration))
    step_samples = int(round(sample_rate * step))

    def accumulate(state: AudioBufferState, value: np.ndarray) -> AudioBufferState:
        if value.ndim != 2 or value.shape[0] != 1:
            raise ValueError(
                f"waveform must have shape (1, samples) but {value.shape} was found"
            )
        start_time = state.start_time
        buffer = (
            value
            if state.buffer is None
            else np.concatenate([state.buffer, value], axis=1)
        )
        if buffer.shape[1] >= step_samples:
            if buffer.shape[1] == step_samples:
                new_chunk, new_buffer = buffer, None
            else:
                new_chunk = buffer[:, :step_samples]
                new_buffer = buffer[:, step_samples:]
            if state.chunk is not None:
                new_chunk = np.concatenate([state.chunk, new_chunk], axis=1)
            if new_chunk.shape[1] > chunk_samples:
                new_chunk = new_chunk[:, -chunk_samples:]
                start_time += step
            return AudioBufferState(new_chunk, new_buffer, start_time, changed=True)
        return AudioBufferState(state.chunk, buffer, start_time, changed=False)

    def to_sliding_window(state: AudioBufferState) -> SlidingWindowFeature:
        resolution = SlidingWindow(
            start=state.start_time,
            duration=1.0 / sample_rate,
            step=1.0 / sample_rate,
        )
        return SlidingWindowFeature(state.chunk.T, resolution)

    def op(source: Observable) -> Observable:
        return source.pipe(
            ops.scan(accumulate, AudioBufferState.initial()),
            ops.filter(
                lambda s: s.chunk is not None and s.chunk.shape[1] == chunk_samples
            ),
            ops.filter(lambda s: s.changed),
            ops.map(to_sliding_window),
        )

    return op


def buffer_slide(n: int) -> Operator:
    """Rolling list of the last ``n`` values (``operators.py:103-110``)."""

    def accumulate(state: List[Any], value: Any) -> List[Any]:
        new_state = [*state, value]
        return new_state[1:] if len(new_state) > n else new_state

    def op(source: Observable) -> Observable:
        return source.pipe(ops.scan(accumulate, []))

    return op


@dataclass
class OutputAccumulationState:
    annotation: Optional[Annotation]
    waveform: Optional[SlidingWindowFeature]
    real_time: float
    next_sample: Optional[int]

    @staticmethod
    def initial() -> "OutputAccumulationState":
        return OutputAccumulationState(None, None, 0.0, 0)

    @property
    def cropped_waveform(self) -> Optional[SlidingWindowFeature]:
        if self.waveform is None:
            return None
        return SlidingWindowFeature(
            self.waveform.data[: self.next_sample], self.waveform.sliding_window
        )

    def to_tuple(self):
        return self.annotation, self.cropped_waveform, self.real_time


def accumulate_output(
    duration: float, step: float, patch_collar: float = 0.05
) -> Operator:
    """Accumulate predictions and audio forever: O(N) space via a doubling
    buffer (``operators.py:147-212``)."""

    def accumulate(state: OutputAccumulationState, value) -> OutputAccumulationState:
        prediction, waveform_in = value[0], value[1] if len(value) > 1 else None
        real_time = duration if state.annotation is None else state.real_time + step

        if state.annotation is None:
            annotation = prediction
        else:
            annotation = state.annotation.update(prediction).support(patch_collar)

        waveform, new_next_sample = None, 0
        if waveform_in is not None:
            num_new = waveform_in.data.shape[0]
            new_next_sample = state.next_sample + num_new
            window = (
                waveform_in.sliding_window
                if state.waveform is None
                else state.waveform.sliding_window
            )
            if state.waveform is None:
                data = np.zeros((10 * num_new, waveform_in.data.shape[1]))
            elif new_next_sample < state.waveform.data.shape[0]:
                data = state.waveform.data
            else:
                data = np.concatenate(
                    (state.waveform.data, np.zeros_like(state.waveform.data)), axis=0
                )
            data[state.next_sample : new_next_sample] = waveform_in.data
            waveform = SlidingWindowFeature(data, window)

        return OutputAccumulationState(annotation, waveform, real_time, new_next_sample)

    def op(source: Observable) -> Observable:
        return source.pipe(
            ops.scan(accumulate, OutputAccumulationState.initial()),
            ops.map(OutputAccumulationState.to_tuple),
        )

    return op


def buffer_output(
    duration: float,
    step: float,
    latency: float,
    sample_rate: int,
    patch_collar: float = 0.05,
) -> Operator:
    """Rolling fixed-size output buffer for live visualization
    (``operators.py:215-304``)."""
    num_samples = int(round(duration * sample_rate))
    num_step_samples = int(round(step * sample_rate))
    resolution = 1.0 / sample_rate

    def accumulate(state: OutputAccumulationState, value) -> OutputAccumulationState:
        prediction, waveform_in = value[0], value[1] if len(value) > 1 else None
        real_time = duration if state.annotation is None else state.real_time + step
        start_time = max(0.0, real_time - latency - duration)

        if state.annotation is None:
            annotation = prediction
        else:
            annotation = state.annotation.update(prediction).support(patch_collar)
            if start_time > 0:
                annotation = annotation.extrude(Segment(0, start_time))

        waveform = None
        new_next_sample = state.next_sample + num_step_samples
        if waveform_in is not None:
            if state.waveform is None:
                expected_duration = duration + step - latency
                expected = int(round(expected_duration * sample_rate))
                new_next_sample = state.next_sample + expected
                data = np.zeros((num_samples + num_step_samples, 1))
                data[:expected] = waveform_in.data[:expected]
            elif state.next_sample <= num_samples:
                data = state.waveform.data
                data[state.next_sample : new_next_sample] = waveform_in.data
            else:
                data = np.roll(state.waveform.data, -num_step_samples, axis=0)
                data[-num_step_samples:] = waveform_in.data[:num_step_samples]
            window = SlidingWindow(start=start_time, duration=resolution, step=resolution)
            waveform = SlidingWindowFeature(data, window)

        return OutputAccumulationState(annotation, waveform, real_time, new_next_sample)

    def op(source: Observable) -> Observable:
        return source.pipe(
            ops.scan(accumulate, OutputAccumulationState.initial()),
            ops.map(OutputAccumulationState.to_tuple),
        )

    return op
