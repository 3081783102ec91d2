"""Speaker segmentation block.

Parity with ``/root/reference/src/diart/blocks/segmentation.py``: runs the
segmentation model over batched waveforms and restores the caller's container
type. Device placement is implicit (XLA), so there is no ``.to(device)``
choreography.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from ..features import TemporalFeatureFormatter, TemporalFeatures
from ..models import SegmentationModel

__all__ = ["SpeakerSegmentation"]


class SpeakerSegmentation:
    def __init__(self, model: SegmentationModel, device=None):
        self.model = model
        self.model.load()
        self.formatter = TemporalFeatureFormatter()

    @staticmethod
    def from_pretrained(
        model, use_hf_token: Union[str, bool, None] = True, device=None
    ) -> "SpeakerSegmentation":
        return SpeakerSegmentation(SegmentationModel.from_pretrained(model, use_hf_token))

    def __call__(self, waveform: TemporalFeatures) -> TemporalFeatures:
        """waveform (samples, channels) or (batch, samples, channels) ->
        activations (batch, frames, speakers)."""
        wave = self.formatter.cast(waveform)  # (B, samples, ch)
        output = self.model(jnp.swapaxes(wave, 1, 2))
        return self.formatter.restore_type(output)
