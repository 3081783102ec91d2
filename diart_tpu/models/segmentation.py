"""End-to-end speaker segmentation model (PyanNet-style), in JAX/flax.

Native equivalent of the ``pyannote/segmentation`` family the reference
wraps lazily (``/root/reference/src/diart/models.py:142-198``): SincNet
frontend, stacked BiLSTM, two feed-forward layers, per-speaker sigmoid
classifier. Emits one multilabel activation per ~17 ms frame, K speakers per
chunk (paper §3.2).

Powerset variants (``pyannote/segmentation-3.0``) are handled by composing
with :class:`diart_tpu.models.powerset.Powerset`, mirroring the reference's
``PowersetAdapter`` (``models.py:29-39``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .lstm import BiLSTM
from .sincnet import SincNet

__all__ = ["PyanNet"]


class PyanNet(nn.Module):
    """SincNet -> BiLSTM -> linear x2 -> sigmoid classifier.

    Attributes
    ----------
    num_speakers: maximum concurrent speakers per chunk (output channels).
    lstm_hidden / lstm_layers: recurrence size (defaults match
        pyannote/segmentation: 128 x 4, bidirectional).
    linear_dims: hidden feed-forward sizes after the LSTM.
    powerset_classes: if > 0, emit `powerset_classes` logits instead of
        per-speaker sigmoids (decode with models.powerset).
    """

    num_speakers: int = 4
    sample_rate: int = 16000
    compute_dtype: "jnp.dtype" = jnp.float32
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_dims: tuple = (128, 128)
    powerset_classes: int = 0

    # the engine may feed the phase-decomposed waveform layout directly
    # (``phased=True``; see models/sincnet.py SincConv)
    supports_phased_wave = True

    @nn.compact
    def __call__(
        self,
        waveform: jnp.ndarray,
        sinc_pooled=None,
        phased: bool = False,
    ) -> jnp.ndarray:
        """waveform: (batch, 1, samples) -> (batch, frames, speakers)

        Output activations are in [0, 1] (multilabel sigmoid) unless
        ``powerset_classes`` is set, in which case raw log-softmax powerset
        scores are returned. ``sinc_pooled``: optional precomputed pooled
        sinc-conv activation (engine stacked-frontend path — see
        :class:`diart_tpu.models.sincnet.SincNet`). ``phased``: waveform is
        the engine's phase-major ring layout (batch, stride, samples/stride).
        """
        x = SincNet(
            sample_rate=self.sample_rate,
            compute_dtype=self.compute_dtype,
            name="sincnet",
        )(waveform, pooled=sinc_pooled, phased=phased)
        x = jnp.swapaxes(x, 1, 2)  # (batch, frames, 60)
        # keep the LSTM stack's time-major layout through the per-frame
        # Dense layers (layout-agnostic) and transpose only the K-wide
        # classifier output — ~60x fewer bytes than transposing the hidden
        # sequence
        x = BiLSTM(
            hidden_size=self.lstm_hidden,
            num_layers=self.lstm_layers,
            keep_time_major=True,
            name="lstm",
        )(x)  # (frames, batch, 2H)
        for i, dim in enumerate(self.linear_dims):
            x = nn.Dense(dim, name=f"linear{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        if self.powerset_classes > 0:
            logits = nn.Dense(self.powerset_classes, name="classifier")(x)
            return jnp.swapaxes(nn.log_softmax(logits, axis=-1), 0, 1)
        logits = nn.Dense(self.num_speakers, name="classifier")(x)
        return jnp.swapaxes(nn.sigmoid(logits), 0, 1)
