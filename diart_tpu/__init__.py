"""diart-tpu: TPU-native streaming speaker diarization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`juanmc2005/diart` (reference mounted at /root/reference), designed
TPU-first: fixed-shape functional state, fused on-device streaming steps,
streams as the batch dimension, mesh sharding for multi-chip scale-out.
"""

from .blocks import (
    SpeakerDiarization,
    SpeakerDiarizationConfig,
    VoiceActivityDetection,
    VoiceActivityDetectionConfig,
)
from .precision import Precision

__version__ = "0.1.0"

__all__ = [
    "Precision",
    "SpeakerDiarization",
    "SpeakerDiarizationConfig",
    "VoiceActivityDetection",
    "VoiceActivityDetectionConfig",
]
