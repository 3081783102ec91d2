"""Hermetic fake models + synthetic audio for end-to-end runtime tests.

The reference has no hermetic tests at all (its CI streams real AMI audio
through real HF models, SURVEY.md §4); here a deterministic "oracle" model
pair lets the FULL streaming stack run in CI: speakers are pure tones at
distinct frequencies, the fake segmentation model measures per-band
amplitude, and the fake embedding model returns the normalized band-energy
profile — so diarization output is exactly predictable.
"""

from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from diart_tpu.core import Annotation, Segment
from diart_tpu.models import EmbeddingModel, SegmentationModel

SAMPLE_RATE = 16000
FRAME_SAMPLES = 160  # 100 frames per second
SPEAKER_FREQS = (500.0, 1500.0, 3000.0)
TONE_AMPLITUDE = 0.3


def _band_amplitudes(wave: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, S) -> per-frame tone amplitudes (B, T, K) via quadrature
    correlation at each speaker frequency."""
    x = wave[:, 0, :]
    batch, samples = x.shape
    frames = x.reshape(batch, samples // FRAME_SAMPLES, FRAME_SAMPLES)
    t = jnp.arange(FRAME_SAMPLES) / SAMPLE_RATE
    outs = []
    for f in SPEAKER_FREQS:
        s = jnp.mean(frames * jnp.sin(2 * jnp.pi * f * t), axis=-1)
        c = jnp.mean(frames * jnp.cos(2 * jnp.pi * f * t), axis=-1)
        outs.append(2.0 * jnp.sqrt(s**2 + c**2))  # amplitude estimate
    return jnp.stack(outs, axis=-1)


def fake_segmentation(num_speakers: int = len(SPEAKER_FREQS)) -> SegmentationModel:
    def apply_fn(params, wave):
        amp = _band_amplitudes(wave)[..., :num_speakers]
        return jnp.clip(amp / TONE_AMPLITUDE, 0.0, 1.0)

    return SegmentationModel.from_apply(
        apply_fn, sample_rate=SAMPLE_RATE, num_speakers=num_speakers
    )


def fake_embedding() -> EmbeddingModel:
    dim = len(SPEAKER_FREQS)

    def trunk_fn(params, wave):
        return _band_amplitudes(wave)  # (B, T, K)

    def head_fn(params, frames, weights):
        # weights (B, K, Tw) resampled to T by nearest
        T = frames.shape[1]
        src = weights.shape[-1]
        idx = (jnp.arange(T) * src) // src if src == T else (jnp.arange(T) * src) // T
        w = jnp.take(weights, idx, axis=-1)
        total = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
        pooled = jnp.einsum("btc,bst->bsc", frames, w / total)
        return pooled

    return EmbeddingModel.from_apply(
        trunk_fn, head_fn, sample_rate=SAMPLE_RATE, embedding_dim=dim
    )


@dataclass
class Turn:
    start: float
    end: float
    speaker: int


def synth_audio(turns: List[Turn], total: float, seed: int = 0) -> np.ndarray:
    """Render (1, samples) audio: each turn is a tone at its speaker's
    frequency plus a small noise floor."""
    rng = np.random.default_rng(seed)
    n = int(total * SAMPLE_RATE)
    x = 0.002 * rng.standard_normal(n).astype(np.float32)
    t = np.arange(n) / SAMPLE_RATE
    for turn in turns:
        mask = (t >= turn.start) & (t < turn.end)
        x[mask] += TONE_AMPLITUDE * np.sin(
            2 * np.pi * SPEAKER_FREQS[turn.speaker] * t[mask]
        ).astype(np.float32)
    return x[None, :]


def turns_to_annotation(turns: List[Turn], uri: str = "synth") -> Annotation:
    ann = Annotation(uri=uri)
    for i, turn in enumerate(turns):
        ann[Segment(turn.start, turn.end), i] = f"speaker{turn.speaker}"
    return ann
