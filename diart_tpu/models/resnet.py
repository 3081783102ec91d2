"""WeSpeaker-style ResNet34 speaker embedding model, in JAX/flax.

Native equivalent of the ``wespeaker-voxceleb-resnet34-LM`` family the
reference serves via pyannote wrappers / ONNX
(``/root/reference/README.md:172-173``; loaded through
``src/diart/models.py:240-265``): Kaldi fbank frontend with per-utterance
mean normalization, a 2D ResNet34 over the (time, mel) plane, temporal
statistics pooling over the flattened (freq x channel) maps, and a linear
projection to the embedding space. The compute graph and state-dict layout
follow wespeaker's ``speaker/models/resnet.py`` (verified against a faithful
torch replica in ``tests/test_convert.py``), so released checkpoints convert
weight-for-weight.

Trunk/head split as in :mod:`diart_tpu.models.embedding`: the convolutional
trunk runs once per chunk; the pooling head fans out per speaker with
external frame weights (weighted statistics, the paper's Eq. 2 treatment —
wespeaker's TSTP is the uniform-weight special case).

TPU notes: the ResNet is NHWC with fused conv+BN-ready inference form; all
convs are 3x3/1x1 stride-2 downsamples that XLA maps directly onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import InferenceBatchNorm as _BatchNorm
from .common import QuantizableConv, resample_weights
from .fbank import kaldi_log_mel

__all__ = ["ResNet34"]


class _BasicBlock(nn.Module):
    """torchvision/wespeaker BasicBlock: 3x3 conv-bn-relu, 3x3 conv-bn,
    (optional 1x1 stride-s downsample on the residual), relu."""

    features: int
    stride: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv_kw = dict(compute_dtype=self.compute_dtype)
        pad3 = ((1, 1), (1, 1))
        residual = x
        y = QuantizableConv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=pad3, name="conv1", **conv_kw,
        )(x)
        y = nn.relu(_BatchNorm(self.features, name="bn1")(y))
        y = QuantizableConv(self.features, (3, 3), padding=pad3, name="conv2", **conv_kw)(y)
        y = _BatchNorm(self.features, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = QuantizableConv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                name="downsample_conv", **conv_kw,
            )(x)
            residual = _BatchNorm(self.features, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet34(nn.Module):
    """ResNet34 speaker embedding with weighted temporal statistics pooling.

    Defaults follow the wespeaker voxceleb resnet34 recipe: base 32 channels,
    stage depths (3, 4, 6, 3), 80 mel bins, 256-dim embeddings.
    """

    embedding_dim: int = 256
    base_channels: int = 32
    depths: Tuple[int, int, int, int] = (3, 4, 6, 3)
    num_mels: int = 80
    sample_rate: int = 16000
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.base_channels
        self.conv1 = nn.Conv(
            c, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.compute_dtype, param_dtype=jnp.float32, name="conv1",
        )
        self.bn1 = _BatchNorm(c, name="bn1")
        blocks = []
        for stage, depth in enumerate(self.depths):
            features = c * (2**stage)
            for i in range(depth):
                stride = 2 if (stage > 0 and i == 0) else 1
                blocks.append(
                    _BasicBlock(
                        features, stride, self.compute_dtype,
                        name=f"layer{stage + 1}_{i}",
                    )
                )
        self.blocks = blocks
        self.embedding = nn.Dense(self.embedding_dim, name="embedding")

    # ------------------------------------------------------------------ #
    def __call__(
        self, waveform: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.head(self.trunk(waveform), weights)

    def features(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(batch, 1, samples) -> (batch, frames, num_mels) normalized
        Kaldi fbanks (wespeaker's frontend: kaldi fbank + CMN)."""
        feats = kaldi_log_mel(
            waveform[:, 0, :], num_mels=self.num_mels, sample_rate=self.sample_rate
        )
        return feats - jnp.mean(feats, axis=1, keepdims=True)

    # incremental-frontend protocol (engine fbank_ring; models/fbank.py)
    fbank_ring_kind = "kaldi"

    def finalize_fbank(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Window-dependent tail of ``features``: wespeaker's CMN (the
        kaldi log-mel itself is frame-local and lives in the ring)."""
        return raw - jnp.mean(raw, axis=1, keepdims=True)

    def trunk_from_raw_fbank(self, raw: jnp.ndarray) -> jnp.ndarray:
        return self.trunk_from_features(self.finalize_fbank(raw))

    def trunk(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(batch, 1, samples) -> (batch, frames', freq' * channels)."""
        return self.trunk_from_features(self.features(waveform))

    def trunk_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(batch, frames, num_mels) -> (batch, frames', freq' * channels).

        The (time, mel) plane runs through the ResNet as an NHWC image with
        one input channel; the trailing per-frame feature is the flattened
        (freq', channels) map — wespeaker's pre-pooling layout. Runs in
        ``compute_dtype``; the fbank frontend and pooling head stay f32.
        """
        x = feats.astype(self.compute_dtype)[..., None]  # (B, T, F, 1)
        x = nn.relu(self.bn1(self.conv1(x)))
        for block in self.blocks:
            x = block(x)
        b, t, f, c = x.shape
        # wespeaker flattens as (C, F) per frame: x.transpose -> (B,T,C,F)
        return jnp.swapaxes(x, 2, 3).reshape(b, t, c * f)

    def head(
        self, frames: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """frames (B, T', D); weights (B, S, Tw) -> (B, S, dim).

        TSTP = temporal mean + std (unbiased, wespeaker convention) of the
        flattened maps; external weights generalize it to reliability-
        weighted statistics (uniform weights reproduce TSTP exactly).
        """
        squeeze = weights is None
        if weights is None:
            weights = jnp.ones(frames.shape[:1] + (1, frames.shape[1]), frames.dtype)
        weights = resample_weights(weights, frames.shape[1])

        v1 = jnp.sum(weights, axis=-1)  # (B, S)
        v2 = jnp.sum(weights**2, axis=-1)
        s1 = jnp.einsum(
            "btd,bst->bsd", frames, weights, preferred_element_type=jnp.float32
        )
        s2 = jnp.einsum(
            "btd,bst->bsd", frames**2, weights, preferred_element_type=jnp.float32
        )
        mean = s1 / jnp.maximum(v1, 1e-8)[..., None]
        sq_dev = s2 - 2 * mean * s1 + mean**2 * v1[..., None]
        # unbiased denominator (torch.var default), reliability-weighted;
        # the 1e-7 epsilon (wespeaker TSTP) also keeps the sqrt gradient
        # finite at var == 0
        denom = (v1 - v2 / jnp.maximum(v1, 1e-8))[..., None]
        var = jnp.maximum(sq_dev / jnp.maximum(denom, 1e-8), 0.0)
        std = jnp.sqrt(var + 1e-7)
        pooled = jnp.concatenate([mean, std], axis=-1)
        emb = self.embedding(pooled)
        return emb[:, 0] if squeeze else emb
