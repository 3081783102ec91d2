"""Polymorphic temporal feature formatting.

Equivalent of ``/root/reference/src/diart/features.py``: blocks accept
``SlidingWindowFeature`` / numpy / JAX arrays interchangeably; the formatter
casts to a batched device array and restores the original container on
output (remembering start timestamps for windowed features).
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from .core.segment import SlidingWindow, SlidingWindowFeature

TemporalFeatures = Union[SlidingWindowFeature, np.ndarray, jnp.ndarray]

__all__ = ["TemporalFeatures", "TemporalFeatureFormatter"]


class TemporalFeatureFormatter:
    """Casts temporal features to (batch, frames, dims) arrays and restores
    the input container type on the way out."""

    def __init__(self):
        self._kind: Optional[str] = None
        self._start_time: float = 0.0
        self._duration: float = 0.0

    def cast(self, features: TemporalFeatures) -> jnp.ndarray:
        if isinstance(features, SlidingWindowFeature):
            sw = features.sliding_window
            assert sw.duration == sw.step, (
                "features sliding window duration and step must be equal"
            )
            self._kind = "windowed"
            self._start_time = sw.start
            self._duration = features.data.shape[0] * sw.duration
            data = jnp.asarray(features.data, jnp.float32)
        elif isinstance(features, np.ndarray):
            self._kind = "numpy"
            data = jnp.asarray(features, jnp.float32)
        else:
            self._kind = "jax"
            data = jnp.asarray(features, jnp.float32)
        assert data.ndim in (2, 3), "temporal features must be 2D or 3D"
        if data.ndim == 2:
            data = data[None]
        return data

    def restore_type(self, features: jnp.ndarray) -> TemporalFeatures:
        if self._kind == "windowed":
            batch, num_frames, _ = features.shape
            assert batch == 1, "batched SlidingWindowFeature is not supported"
            resolution = self._duration / num_frames
            window = SlidingWindow(
                start=self._start_time, duration=resolution, step=resolution
            )
            return SlidingWindowFeature(np.asarray(features[0]), window)
        if self._kind == "numpy":
            return np.asarray(features)
        return features
