"""Polymorphic temporal feature formatting.

Equivalent of ``/root/reference/src/diart/features.py``: blocks accept
``SlidingWindowFeature`` / numpy / torch / JAX arrays interchangeably; the
formatter casts to a batched device array and restores the original
container on output (remembering start timestamps for windowed features).
Each container kind is handled by a small state object
(``TemporalFeatureFormatterState``), mirroring the reference's public
surface (``features.py:38-75``) so user-supplied states drop in.
"""

from __future__ import annotations

import sys
from abc import ABC, abstractmethod
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from .core.segment import SlidingWindow, SlidingWindowFeature

TemporalFeatures = Union[SlidingWindowFeature, np.ndarray, jnp.ndarray]

__all__ = [
    "TemporalFeatures",
    "TemporalFeatureFormatter",
    "TemporalFeatureFormatterState",
    "SlidingWindowFeatureFormatterState",
    "NumpyArrayFormatterState",
    "TorchTensorFormatterState",
    "DeviceArrayFormatterState",
]


class TemporalFeatureFormatterState(ABC):
    """Remembers one input container kind and restores it on output."""

    @abstractmethod
    def restore(self, features: jnp.ndarray) -> TemporalFeatures:
        ...


class SlidingWindowFeatureFormatterState(TemporalFeatureFormatterState):
    def __init__(self, start_time: float, duration: float):
        self.start_time = start_time
        self.duration = duration  # total covered duration, seconds

    def restore(self, features: jnp.ndarray) -> TemporalFeatures:
        batch, num_frames, _ = features.shape
        assert batch == 1, "batched SlidingWindowFeature is not supported"
        resolution = self.duration / num_frames
        window = SlidingWindow(
            start=self.start_time, duration=resolution, step=resolution
        )
        return SlidingWindowFeature(np.asarray(features[0]), window)


class NumpyArrayFormatterState(TemporalFeatureFormatterState):
    def restore(self, features: jnp.ndarray) -> TemporalFeatures:
        return np.asarray(features)


class TorchTensorFormatterState(TemporalFeatureFormatterState):
    def restore(self, features: jnp.ndarray) -> TemporalFeatures:
        import torch

        # device arrays expose a read-only numpy view; torch needs writable
        return torch.from_numpy(np.array(features))


class DeviceArrayFormatterState(TemporalFeatureFormatterState):
    def restore(self, features: jnp.ndarray) -> TemporalFeatures:
        return features


def _is_torch_tensor(value) -> bool:
    # only consult torch if the caller already imported it — passing a
    # tensor implies torch is loaded, and we avoid importing it otherwise
    torch = sys.modules.get("torch")
    return torch is not None and isinstance(value, torch.Tensor)


class TemporalFeatureFormatter:
    """Casts temporal features to (batch, frames, dims) arrays and restores
    the input container type on the way out."""

    def __init__(self):
        self._state: Optional[TemporalFeatureFormatterState] = None

    def cast(self, features: TemporalFeatures) -> jnp.ndarray:
        if isinstance(features, SlidingWindowFeature):
            sw = features.sliding_window
            assert sw.duration == sw.step, (
                "features sliding window duration and step must be equal"
            )
            self._state = SlidingWindowFeatureFormatterState(
                sw.start, features.data.shape[0] * sw.duration
            )
            data = jnp.asarray(features.data, jnp.float32)
        elif isinstance(features, np.ndarray):
            self._state = NumpyArrayFormatterState()
            data = jnp.asarray(features, jnp.float32)
        elif _is_torch_tensor(features):
            self._state = TorchTensorFormatterState()
            data = jnp.asarray(features.detach().cpu().numpy(), jnp.float32)
        else:
            self._state = DeviceArrayFormatterState()
            data = jnp.asarray(features, jnp.float32)
        assert data.ndim in (2, 3), "temporal features must be 2D or 3D"
        if data.ndim == 2:
            data = data[None]
        return data

    def restore_type(self, features: jnp.ndarray) -> TemporalFeatures:
        assert self._state is not None, "cast() must be called before restore_type()"
        return self._state.restore(features)
