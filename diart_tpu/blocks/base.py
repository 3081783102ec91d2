"""Pipeline and configuration base classes + tunable hyper-parameter registry.

API parity with ``/root/reference/src/diart/blocks/base.py``: pipelines are
stateful stream processors consuming batches of consecutive sliding-window
chunks; configs expose the time geometry and file-padding computation used by
the runtime (``base.py:81-85``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Sequence, Tuple

from .. import utils
from ..audio import AudioLoader, FilePath
from ..core.segment import SlidingWindowFeature
from ..metrics import BaseMetric

__all__ = [
    "HyperParameter",
    "TauActive",
    "RhoUpdate",
    "DeltaNew",
    "PipelineConfig",
    "Pipeline",
]


@dataclass
class HyperParameter:
    """A tunable pipeline hyper-parameter (``base.py:12-47``)."""

    name: str
    low: float
    high: float

    @staticmethod
    def from_name(name: str) -> "HyperParameter":
        if name == "tau_active":
            return TauActive
        if name == "rho_update":
            return RhoUpdate
        if name == "delta_new":
            return DeltaNew
        raise ValueError(f"hyper-parameter '{name}' not recognized")


TauActive = HyperParameter("tau_active", low=0.0, high=1.0)
RhoUpdate = HyperParameter("rho_update", low=0.0, high=1.0)
DeltaNew = HyperParameter("delta_new", low=0.0, high=2.0)


class PipelineConfig(ABC):
    """Time geometry + resources needed to build and run a pipeline."""

    @property
    @abstractmethod
    def duration(self) -> float:
        """Input chunk duration in seconds."""

    @property
    @abstractmethod
    def step(self) -> float:
        """Shift between consecutive chunks in seconds."""

    @property
    @abstractmethod
    def latency(self) -> float:
        """Algorithmic latency in seconds: at stream time t the pipeline
        emits predictions for time t - latency."""

    @property
    @abstractmethod
    def sample_rate(self) -> int:
        """Expected input sample rate."""

    def get_file_padding(self, filepath: FilePath) -> Tuple[float, float]:
        """(left, right) zero-padding so a file's predictions align to t=0
        and cover its full duration (``base.py:81-85``, ``utils.py:69-88``)."""
        file_duration = AudioLoader(self.sample_rate, mono=True).get_duration(filepath)
        right = utils.get_padding_right(self.latency, self.step)
        left = utils.get_padding_left(file_duration + right, self.duration)
        return left, right


class Pipeline(ABC):
    """A streaming audio pipeline (``base.py:88-137``)."""

    @staticmethod
    @abstractmethod
    def get_config_class() -> type: ...

    @staticmethod
    @abstractmethod
    def suggest_metric() -> BaseMetric: ...

    @staticmethod
    @abstractmethod
    def hyper_parameters() -> Sequence[HyperParameter]: ...

    @property
    @abstractmethod
    def config(self) -> PipelineConfig: ...

    @abstractmethod
    def reset(self): ...

    @abstractmethod
    def set_timestamp_shift(self, shift: float): ...

    @abstractmethod
    def __call__(
        self, waveforms: Sequence[SlidingWindowFeature]
    ) -> Sequence[Tuple[Any, SlidingWindowFeature]]:
        """Process consecutive chunks; return (prediction, audio) pairs."""
