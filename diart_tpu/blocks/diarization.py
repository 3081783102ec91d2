"""Streaming speaker diarization pipeline.

Parity target: ``/root/reference/src/diart/blocks/diarization.py``. Same
composition (segmentation -> overlap-aware embedding -> online clustering ->
delayed aggregation -> binarize -> timestamp shift) and identical defaults
(tau=0.6, rho=0.3, delta=1, gamma=3, beta=10, max_speakers=20, 16 kHz,
latency in [step, duration]).

TPU-native execution plan (vs the reference's per-chunk host loop):

* segmentation + embedding for a batch of N consecutive windows run in ONE
  jitted call (trunk shared across speakers, see models/embedding.py);
* the stateful clustering runs as a ``lax.scan`` over the window axis inside
  the same device program — the sequential dependency stays on device, no
  per-window host round-trip (the reference syncs to numpy every window,
  ``diarization.py:200-203``);
* aggregation/binarize/RTTM run host-side on the tiny latency-delayed score
  window, using the host-exact oracle blocks for bit-level parity.

For serving hundreds of concurrent streams use
:class:`diart_tpu.parallel.MultiStreamEngine`, which fuses the whole loop
including aggregation into one step and batches over streams.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import base
from .aggregation import DelayedAggregation
from .utils import Binarize
from .. import models as m
from ..core.annotation import Annotation
from ..core.segment import SlidingWindow, SlidingWindowFeature
from ..metrics import BaseMetric, DiarizationErrorRate
from ..ops.clustering import ClusteringParams, cluster_step, init_state
from ..ops.functional import (
    min_max_normalize,
    normalize_embeddings,
    overlapped_speech_penalty,
)

__all__ = ["SpeakerDiarizationConfig", "SpeakerDiarization"]


class SpeakerDiarizationConfig(base.PipelineConfig):
    """Hyper-parameters and resources (``diarization.py:21-86``)."""

    def __init__(
        self,
        segmentation: Optional[m.SegmentationModel] = None,
        embedding: Optional[m.EmbeddingModel] = None,
        duration: float = 5.0,
        step: float = 0.5,
        latency: Optional[Union[float, str]] = None,
        tau_active: float = 0.6,
        rho_update: float = 0.3,
        delta_new: float = 1.0,
        gamma: float = 3.0,
        beta: float = 10.0,
        max_speakers: int = 20,
        normalize_embedding_weights: bool = False,
        device=None,
        sample_rate: int = 16000,
        **kwargs,
    ):
        self.segmentation = segmentation or m.SegmentationModel.from_pretrained(
            "tpu/pyannet"
        )
        self.embedding = embedding or m.EmbeddingModel.from_pretrained("tpu/xvector")
        self._duration = duration
        self._sample_rate = sample_rate
        self._step = step
        self._latency = latency
        if self._latency is None or self._latency == "min":
            self._latency = self._step
        elif self._latency == "max":
            self._latency = self._duration
        self.tau_active = tau_active
        self.rho_update = rho_update
        self.delta_new = delta_new
        self.gamma = gamma
        self.beta = beta
        self.max_speakers = max_speakers
        self.normalize_embedding_weights = normalize_embedding_weights
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


class SpeakerDiarization(base.Pipeline):
    """The flagship pipeline (``diarization.py:89-234``)."""

    def __init__(self, config: Optional[SpeakerDiarizationConfig] = None):
        self._config = SpeakerDiarizationConfig() if config is None else config
        msg = f"latency should be in the range [{self._config.step}, {self._config.duration}]"
        assert self._config.step <= self._config.latency <= self._config.duration, msg

        cfg = self._config
        cfg.segmentation.load()
        cfg.embedding.load()
        # Host-only models (ONNX: params is None) can't join the jitted
        # forward; they run eagerly through the wrapper __call__ instead,
        # matching the reference's ONNX execution (models.py:62-109).
        self._host_seg = cfg.segmentation.params is None
        self._host_emb = cfg.embedding.params is None
        self._seg_apply = None if self._host_seg else cfg.segmentation.apply_fn()
        self._trunk = None if self._host_emb else cfg.embedding.trunk_fn()
        self._head = None if self._host_emb else cfg.embedding.head_fn()
        self._cluster_params = ClusteringParams(
            cfg.tau_active, cfg.rho_update, cfg.delta_new
        )

        self.pred_aggregation = DelayedAggregation(
            cfg.step, cfg.latency, strategy="hamming", cropping_mode="loose"
        )
        self.audio_aggregation = DelayedAggregation(
            cfg.step, cfg.latency, strategy="first", cropping_mode="center"
        )
        self.binarize = Binarize(cfg.tau_active)

        if self._host_seg or self._host_emb:
            self._forward = self._forward_host
        else:
            self._forward = jax.jit(self._forward_impl)
        self._scan_cluster = jax.jit(self._scan_cluster_impl)

        # Internal state, handle with care (``diarization.py:121-125``).
        self.timestamp_shift = 0.0
        self.clustering_state = None
        self.chunk_buffer, self.pred_buffer = [], []
        self.reset()

    # ------------------------------------------------------------------ #
    @staticmethod
    def get_config_class() -> type:
        return SpeakerDiarizationConfig

    @staticmethod
    def suggest_metric() -> BaseMetric:
        return DiarizationErrorRate(collar=0, skip_overlap=False)

    @staticmethod
    def hyper_parameters() -> Sequence[base.HyperParameter]:
        return [base.TauActive, base.RhoUpdate, base.DeltaNew]

    @property
    def config(self) -> SpeakerDiarizationConfig:
        return self._config

    def set_timestamp_shift(self, shift: float):
        self.timestamp_shift = shift

    def reset(self):
        self.set_timestamp_shift(0.0)
        # rebuilt from the config, like the reference's reset() which
        # reconstructs OnlineSpeakerClustering from self.config
        # (diarization.py:146-155) — callers that mutate config
        # hyper-parameters between files expect reset to pick them up
        self._cluster_params = ClusteringParams(
            self._config.tau_active,
            self._config.rho_update,
            self._config.delta_new,
        )
        self.clustering_state = init_state(
            self._config.max_speakers, self._config.embedding.embedding_dim
        )
        self.chunk_buffer, self.pred_buffer = [], []

    # ------------------------------------------------------------------ #
    def _forward_impl(self, seg_params, emb_params, batch: jnp.ndarray):
        """(N, samples, channels) -> seg (N, F, K), emb (N, K, E)."""
        wave = jnp.swapaxes(batch, 1, 2)  # (N, ch, samples)
        seg = self._seg_apply(seg_params, wave)
        weights = overlapped_speech_penalty(
            seg, self._config.gamma, self._config.beta
        )
        if self._config.normalize_embedding_weights:
            weights = min_max_normalize(weights, axis=-2)
        frames = self._trunk(emb_params, wave)
        emb = self._head(emb_params, frames, jnp.swapaxes(weights, 1, 2))
        return seg, normalize_embeddings(emb, 1.0)

    def _forward_host(self, seg_params, emb_params, batch: jnp.ndarray):
        """Eager forward for host-only (ONNX) models. Same contract as
        :meth:`_forward_impl`; the per-speaker waveform repetition mirrors
        the reference's embedding batching (blocks/embedding.py:54-65)."""
        wave = jnp.swapaxes(batch, 1, 2)  # (N, ch, samples)
        if self._host_seg:
            seg = jnp.asarray(self._config.segmentation(np.asarray(wave)))
        else:
            seg = self._seg_apply(seg_params, wave)
        weights = overlapped_speech_penalty(
            seg, self._config.gamma, self._config.beta
        )
        if self._config.normalize_embedding_weights:
            weights = min_max_normalize(weights, axis=-2)
        if self._host_emb:
            n, k = seg.shape[0], seg.shape[2]
            wave_rep = np.repeat(np.asarray(wave), k, axis=0)  # (N*K, ch, S)
            w_flat = np.asarray(jnp.swapaxes(weights, 1, 2)).reshape(n * k, -1)
            emb = np.asarray(self._config.embedding(wave_rep, w_flat))
            emb = jnp.asarray(emb.reshape(n, k, -1))
        else:
            frames = self._trunk(emb_params, wave)
            emb = self._head(emb_params, frames, jnp.swapaxes(weights, 1, 2))
        return seg, normalize_embeddings(emb, 1.0)

    def _scan_cluster_impl(self, state, segs: jnp.ndarray, embs: jnp.ndarray):
        """Sequential clustering over the window axis, on device."""

        def body(cstate, inputs):
            seg, emb = inputs
            new_state, permuted, _ = cluster_step(
                cstate, seg, emb, self._cluster_params
            )
            return new_state, permuted

        return jax.lax.scan(body, state, (segs, embs))

    # ------------------------------------------------------------------ #
    def __call__(
        self, waveforms: Sequence[SlidingWindowFeature]
    ) -> Sequence[Tuple[Annotation, SlidingWindowFeature]]:
        batch_size = len(waveforms)
        assert batch_size >= 1, "Pipeline expected at least 1 input"

        batch = jnp.stack(
            [jnp.asarray(w.data, jnp.float32) for w in waveforms]
        )  # (N, samples, ch)
        expected = int(np.rint(self._config.duration * self._config.sample_rate))
        assert batch.shape[1] == expected, (
            f"Expected {expected} samples per chunk, but got {batch.shape[1]}"
        )

        segmentations, embeddings = self._forward(
            self._config.segmentation.params, self._config.embedding.params, batch
        )
        if embeddings.shape[-1] != self.clustering_state.centers.shape[-1]:
            # Host-only (ONNX) embedding models don't expose their dim until
            # the first call; rebuild the empty clustering state to match.
            if bool(np.asarray(self.clustering_state.initialized).any()):
                raise RuntimeError(
                    f"embedding dim changed mid-stream: "
                    f"{self.clustering_state.centers.shape[-1]} -> "
                    f"{embeddings.shape[-1]}"
                )
            self.clustering_state = init_state(
                self._config.max_speakers, int(embeddings.shape[-1])
            )
        self.clustering_state, permuted = self._scan_cluster(
            self.clustering_state, segmentations, embeddings
        )
        permuted = np.asarray(permuted)  # (N, F, max_speakers)

        seg_resolution = waveforms[0].extent.duration / permuted.shape[1]
        outputs = []
        for wav, scores in zip(waveforms, permuted):
            sw = SlidingWindow(
                start=wav.extent.start, duration=seg_resolution, step=seg_resolution
            )
            self.chunk_buffer.append(wav)
            self.pred_buffer.append(SlidingWindowFeature(scores, sw))

            agg_waveform = self.audio_aggregation(self.chunk_buffer)
            agg_prediction = self.pred_aggregation(self.pred_buffer)
            prediction = self.binarize(agg_prediction)
            if self.timestamp_shift != 0:
                prediction = prediction.shift(self.timestamp_shift)
            outputs.append((prediction, agg_waveform))

            if len(self.chunk_buffer) == self.pred_aggregation.num_overlapping_windows:
                self.chunk_buffer = self.chunk_buffer[1:]
                self.pred_buffer = self.pred_buffer[1:]
        return outputs
