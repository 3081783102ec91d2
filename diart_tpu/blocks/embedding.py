"""Overlap-aware speaker embedding blocks.

Parity with ``/root/reference/src/diart/blocks/embedding.py``. The crucial
TPU-native difference: the reference repeats the waveform once per speaker
and pushes ``(batch*speakers)`` copies through the whole embedding model
(``embedding.py:54-65``); here the trunk runs once per chunk and only the
weighted statistics pooling fans out per speaker
(see :mod:`diart_tpu.models.embedding`).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..features import TemporalFeatureFormatter, TemporalFeatures
from ..models import EmbeddingModel
from ..ops.functional import (
    min_max_normalize,
    normalize_embeddings,
    overlapped_speech_penalty,
)

__all__ = [
    "SpeakerEmbedding",
    "OverlappedSpeechPenalty",
    "EmbeddingNormalization",
    "OverlapAwareSpeakerEmbedding",
]


class SpeakerEmbedding:
    """Embed each speaker of a chunk given per-frame weights
    (``embedding.py:11-68``)."""

    def __init__(self, model: EmbeddingModel, device=None):
        self.model = model
        self.model.load()
        self.waveform_formatter = TemporalFeatureFormatter()
        self.weights_formatter = TemporalFeatureFormatter()
        self._jitted = None

    @staticmethod
    def from_pretrained(
        model, use_hf_token: Union[str, bool, None] = True, device=None
    ) -> "SpeakerEmbedding":
        return SpeakerEmbedding(EmbeddingModel.from_pretrained(model, use_hf_token))

    def __call__(
        self, waveform: TemporalFeatures, weights: Optional[TemporalFeatures] = None
    ) -> jnp.ndarray:
        """waveform (batch, samples, ch); weights (batch, frames, speakers)
        -> (batch, speakers, dim); without weights -> (batch, dim). Unit
        dims are squeezed away like the reference's ``output.squeeze()``
        (embedding.py:68) — single-chunk callers get (speakers, dim)."""
        wave = jnp.swapaxes(self.waveform_formatter.cast(waveform), 1, 2)
        if self.model.params is None:
            # host-only (ONNX) model: the reference's repeat-per-speaker
            # formulation through the wrapper __call__ (models.py:248-265)
            # — there is no jittable trunk/head to split
            import numpy as np

            wave_np = np.asarray(wave)
            if weights is None:
                out = np.asarray(self.model(wave_np))
            else:
                w = np.asarray(self.weights_formatter.cast(weights))
                b, _, k = w.shape
                rep = np.repeat(wave_np, k, axis=0)
                w_flat = np.swapaxes(w, 1, 2).reshape(b * k, -1)
                out = np.asarray(self.model(rep, w_flat)).reshape(b, k, -1)
            return jnp.asarray(out).squeeze()
        if self._jitted is None:
            trunk, head = self.model.trunk_fn(), self.model.head_fn()

            def fn(params, wave, w):
                frames = trunk(params, wave)
                if w is None:
                    ones = jnp.ones(
                        (frames.shape[0], 1, frames.shape[1]), frames.dtype
                    )
                    return head(params, frames, ones)[:, 0]
                return head(params, frames, w)

            self._jitted = jax.jit(fn)
        w = None
        if weights is not None:
            w = jnp.swapaxes(self.weights_formatter.cast(weights), 1, 2)  # (B, S, T)
        return self._jitted(self.model.params, wave, w).squeeze()


class OverlappedSpeechPenalty:
    """Paper Eq. 2 weights (``embedding.py:71-107``)."""

    def __init__(self, gamma: float = 3.0, beta: float = 10.0, normalize: bool = False):
        self.gamma = gamma
        self.beta = beta
        self.normalize = normalize
        self.formatter = TemporalFeatureFormatter()

    def __call__(self, segmentation: TemporalFeatures) -> TemporalFeatures:
        scores = self.formatter.cast(segmentation)
        weights = overlapped_speech_penalty(scores, self.gamma, self.beta)
        if self.normalize:
            weights = min_max_normalize(weights, axis=-2)
        return self.formatter.restore_type(weights)


class EmbeddingNormalization:
    """Rescale embeddings to a target norm (``embedding.py:110-120``)."""

    def __init__(self, norm: Union[float, jnp.ndarray] = 1.0):
        self.norm = norm
        if hasattr(self.norm, "ndim") and self.norm.ndim == 2:
            self.norm = self.norm[None]

    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        return normalize_embeddings(embeddings, self.norm)


class OverlapAwareSpeakerEmbedding:
    """OSP -> weighted embedding -> normalization (``embedding.py:123-178``)."""

    def __init__(
        self,
        model: EmbeddingModel,
        gamma: float = 3.0,
        beta: float = 10.0,
        norm: Union[float, jnp.ndarray] = 1.0,
        normalize_weights: bool = False,
        device=None,
    ):
        self.embedding = SpeakerEmbedding(model)
        self.osp = OverlappedSpeechPenalty(gamma, beta, normalize_weights)
        self.normalize = EmbeddingNormalization(norm)

    @staticmethod
    def from_pretrained(
        model,
        gamma: float = 3.0,
        beta: float = 10.0,
        norm: Union[float, jnp.ndarray] = 1.0,
        use_hf_token: Union[str, bool, None] = True,
        normalize_weights: bool = False,
        device=None,
    ) -> "OverlapAwareSpeakerEmbedding":
        return OverlapAwareSpeakerEmbedding(
            EmbeddingModel.from_pretrained(model, use_hf_token),
            gamma,
            beta,
            norm,
            normalize_weights,
        )

    def __call__(
        self, waveform: TemporalFeatures, segmentation: TemporalFeatures
    ) -> jnp.ndarray:
        return self.normalize(self.embedding(waveform, self.osp(segmentation)))
