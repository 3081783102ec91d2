"""Binarize / Resample / AdjustVolume utility blocks.

Parity with ``/root/reference/src/diart/blocks/utils.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.annotation import Annotation
from ..core.segment import SlidingWindowFeature
from ..features import TemporalFeatureFormatter, TemporalFeatures
from ..ops.binarize import binarize as _binarize
from ..ops.resample import resample as _resample

__all__ = ["Binarize", "Resample", "AdjustVolume"]


class Binarize:
    """Frame probabilities -> continuous speaker turns
    (``blocks/utils.py:11-59``)."""

    def __init__(self, threshold: float, uri: Optional[str] = None):
        self.threshold = threshold
        self.uri = uri

    def __call__(self, segmentation: SlidingWindowFeature) -> Annotation:
        return _binarize(segmentation, self.threshold, uri=self.uri)


class Resample:
    """Dynamic sample-rate conversion block (``blocks/utils.py:62-89``)."""

    def __init__(self, sample_rate: int, resample_rate: int, device=None):
        self.sample_rate = sample_rate
        self.resample_rate = resample_rate
        self.formatter = TemporalFeatureFormatter()

    def __call__(self, waveform: TemporalFeatures) -> TemporalFeatures:
        wav = self.formatter.cast(waveform)  # (B, samples, ch)
        out = _resample(
            jnp.swapaxes(wav, 1, 2), self.sample_rate, self.resample_rate
        )
        return self.formatter.restore_type(jnp.swapaxes(out, 1, 2))


class AdjustVolume:
    """Normalize chunk volume to a target dB with clipping guard
    (``blocks/utils.py:92-137``)."""

    def __init__(self, volume_in_db: float):
        self.target_db = volume_in_db
        self.formatter = TemporalFeatureFormatter()

    @staticmethod
    def get_volumes(waveforms: jnp.ndarray) -> jnp.ndarray:
        """(batch, samples, channels) -> per-channel dB (batch, 1, channels)."""
        return 10 * jnp.log10(
            jnp.mean(jnp.abs(waveforms) ** 2, axis=1, keepdims=True)
        )

    def __call__(self, waveform: TemporalFeatures) -> TemporalFeatures:
        wav = self.formatter.cast(waveform)
        current = self.get_volumes(wav)
        gains = 10 ** ((self.target_db - current) / 20)
        # digitally silent input: current = -inf dB -> gain = inf ->
        # inf * 0 = NaN poisoning everything downstream (a latent flaw in
        # the reference too); pass silence through unchanged instead
        gains = jnp.where(jnp.isfinite(gains), gains, 1.0)
        wav = gains * wav
        maxima = jnp.clip(jnp.amax(jnp.abs(wav), axis=1, keepdims=True), 1.0, None)
        return self.formatter.restore_type(wav / maxima)
