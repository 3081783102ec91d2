"""Voice activity detection pipeline.

Parity target: ``/root/reference/src/diart/blocks/vad.py``: segmentation-only
pipeline emitting a single-label "speech" annotation via per-frame max over
speakers, the same aggregation machinery, and tau as the only tunable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import base
from .aggregation import DelayedAggregation
from .utils import Binarize
from .. import utils
from .. import models as m
from ..core.annotation import Annotation
from ..core.segment import SlidingWindow, SlidingWindowFeature
from ..metrics import BaseMetric, DetectionErrorRate

__all__ = ["VoiceActivityDetectionConfig", "VoiceActivityDetection"]


class VoiceActivityDetectionConfig(base.PipelineConfig):
    def __init__(
        self,
        segmentation: Optional[m.SegmentationModel] = None,
        duration: float = 5.0,
        step: float = 0.5,
        latency: Optional[Union[float, str]] = None,
        tau_active: float = 0.6,
        device=None,
        sample_rate: int = 16000,
        **kwargs,
    ):
        self.segmentation = segmentation or m.SegmentationModel.from_pretrained(
            "tpu/pyannet"
        )
        self._duration = duration
        self._step = step
        self._sample_rate = sample_rate
        self._latency = latency
        if self._latency is None or self._latency == "min":
            self._latency = self._step
        elif self._latency == "max":
            self._latency = self._duration
        self.tau_active = tau_active
        self.device = device

    @property
    def duration(self) -> float:
        return self._duration

    @property
    def step(self) -> float:
        return self._step

    @property
    def latency(self) -> float:
        return self._latency

    @property
    def sample_rate(self) -> int:
        return self._sample_rate


class VoiceActivityDetection(base.Pipeline):
    def __init__(self, config: Optional[VoiceActivityDetectionConfig] = None):
        self._config = VoiceActivityDetectionConfig() if config is None else config
        msg = f"latency should be in the range [{self._config.step}, {self._config.duration}]"
        assert self._config.step <= self._config.latency <= self._config.duration, msg

        self._config.segmentation.load()
        if self._config.segmentation.params is None:
            # Host-only (ONNX) model: run eagerly through the wrapper,
            # matching the reference's ONNX execution (models.py:62-109).
            segmentation = self._config.segmentation

            def forward(batch):  # (N, samples, ch) -> (N, frames, 1)
                seg = np.asarray(segmentation(np.swapaxes(batch, 1, 2)))
                return seg.max(axis=-1, keepdims=True)

            self._forward = forward
        else:
            seg_apply = self._config.segmentation.apply_fn()
            seg_params = self._config.segmentation.params

            def forward(batch):  # (N, samples, ch) -> (N, frames, 1)
                seg = seg_apply(seg_params, jnp.swapaxes(batch, 1, 2))
                return jnp.max(seg, axis=-1, keepdims=True)

            self._forward = jax.jit(forward)

        self.pred_aggregation = DelayedAggregation(
            self._config.step, self._config.latency, strategy="hamming", cropping_mode="loose"
        )
        self.audio_aggregation = DelayedAggregation(
            self._config.step, self._config.latency, strategy="first", cropping_mode="center"
        )
        self.binarize = Binarize(self._config.tau_active)

        self.timestamp_shift = 0.0
        self.chunk_buffer, self.pred_buffer = [], []

    @staticmethod
    def get_config_class() -> type:
        return VoiceActivityDetectionConfig

    @staticmethod
    def suggest_metric() -> BaseMetric:
        return DetectionErrorRate(collar=0, skip_overlap=False)

    @staticmethod
    def hyper_parameters() -> Sequence[base.HyperParameter]:
        return [base.TauActive]

    @property
    def config(self) -> VoiceActivityDetectionConfig:
        return self._config

    def reset(self):
        self.set_timestamp_shift(0.0)
        self.chunk_buffer, self.pred_buffer = [], []

    def set_timestamp_shift(self, shift: float):
        self.timestamp_shift = shift

    def __call__(
        self, waveforms: Sequence[SlidingWindowFeature]
    ) -> Sequence[Tuple[Annotation, SlidingWindowFeature]]:
        batch_size = len(waveforms)
        assert batch_size >= 1, "Pipeline expected at least 1 input"

        batch = jnp.stack([jnp.asarray(w.data, jnp.float32) for w in waveforms])
        expected = int(np.rint(self._config.duration * self._config.sample_rate))
        assert batch.shape[1] == expected, (
            f"Expected {expected} samples per chunk, but got {batch.shape[1]}"
        )

        voice_detection = np.asarray(self._forward(batch))  # (N, frames, 1)
        seg_resolution = waveforms[0].extent.duration / voice_detection.shape[1]

        outputs = []
        for wav, vad in zip(waveforms, voice_detection):
            sw = SlidingWindow(
                start=wav.extent.start, duration=seg_resolution, step=seg_resolution
            )
            self.chunk_buffer.append(wav)
            self.pred_buffer.append(SlidingWindowFeature(vad, sw))

            agg_waveform = self.audio_aggregation(self.chunk_buffer)
            agg_prediction = self.pred_aggregation(self.pred_buffer)
            timeline = self.binarize(agg_prediction).get_timeline(copy=False)

            annotation = timeline.to_annotation(utils.repeat_label("speech"))
            if self.timestamp_shift != 0:
                # one shift implementation for both pipelines
                # (diarization.py uses the same Annotation.shift)
                annotation = annotation.shift(self.timestamp_shift)
            outputs.append((annotation, agg_waveform))

            if len(self.chunk_buffer) == self.pred_aggregation.num_overlapping_windows:
                self.chunk_buffer = self.chunk_buffer[1:]
                self.pred_buffer = self.pred_buffer[1:]
        return outputs
