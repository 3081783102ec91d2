"""ECAPA-TDNN speaker embedding model, in JAX/flax.

Native equivalent of the ``speechbrain/spkrec-ecapa-voxceleb`` family the
reference supports through pyannote's ``PretrainedSpeakerEmbedding``
(``/root/reference/src/diart/models.py:59``; latency table
``README.md:175``): log-mel frontend, TDNN stem, three SE-Res2Blocks with
increasing dilation, multi-layer feature aggregation, and channel- and
context-dependent attentive statistics pooling.

Trunk/head split as in :mod:`diart_tpu.models.embedding`: the convolutional
trunk runs once per chunk, the attentive-pooling head fans out per speaker.
External per-speaker frame weights multiply the attention scores — models of
this family have no weighted pooling natively, which is why the reference
exposes ``normalize_embedding_weights`` for them (``README.md`` note,
``blocks/embedding.py:87-90``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fbank import log_mel_filterbank

__all__ = ["EcapaTDNN"]


class _Conv1dBnRelu(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel - 1) * self.dilation // 2
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
        )(x)
        x = nn.relu(x)
        # inference-form batch norm (running stats as params)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        return scale * (x - mean) * jax.lax.rsqrt(var + 1e-5) + bias


class _Res2Block(nn.Module):
    """Res2Net multi-scale convolution: split channels into `scale` groups,
    each group's conv sees the previous group's output (hierarchical
    receptive field growth at constant FLOPs)."""

    features: int
    kernel: int
    dilation: int
    scale: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        width = self.features // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        outputs = [chunks[0]]
        y = None
        pad = (self.kernel - 1) * self.dilation // 2
        for i in range(1, self.scale):
            inp = chunks[i] if y is None else chunks[i] + y
            y = nn.Conv(
                width,
                kernel_size=(self.kernel,),
                kernel_dilation=(self.dilation,),
                padding=[(pad, pad)],
                name=f"conv{i}",
            )(inp)
            y = nn.relu(y)
            outputs.append(y)
        return jnp.concatenate(outputs, axis=-1)


class _SEBlock(nn.Module):
    """Squeeze-and-excitation over channels."""

    features: int
    bottleneck: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, C)
        s = nn.relu(nn.Dense(self.bottleneck)(s))
        s = nn.sigmoid(nn.Dense(self.features)(s))
        return x * s


class _SERes2Block(nn.Module):
    features: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        x = _Conv1dBnRelu(self.features, 1)(x)
        x = _Res2Block(self.features, self.kernel, self.dilation)(x)
        x = _Conv1dBnRelu(self.features, 1)(x)
        x = _SEBlock(self.features)(x)
        return x + residual


class EcapaTDNN(nn.Module):
    """ECAPA-TDNN with external-weight-aware attentive stats pooling.

    channels/embedding_dim default to the speechbrain voxceleb recipe
    (512 channels, 192-dim embeddings).
    """

    embedding_dim: int = 192
    channels: int = 512
    num_mels: int = 80
    sample_rate: int = 16000
    attention_bottleneck: int = 128

    def setup(self):
        self.stem = _Conv1dBnRelu(self.channels, 5, name="stem")
        self.block1 = _SERes2Block(self.channels, 3, 2, name="block1")
        self.block2 = _SERes2Block(self.channels, 3, 3, name="block2")
        self.block3 = _SERes2Block(self.channels, 3, 4, name="block3")
        self.mfa = _Conv1dBnRelu(3 * self.channels, 1, name="mfa")
        # attention bottleneck split into local (per frame) and global
        # (context stats) parts: Dense([f, mean, std]) == Dense_l(f) +
        # Dense_g([mean, std]), avoiding a (B, T, 3C) concat in memory
        self.att_local = nn.Dense(self.attention_bottleneck, name="att_local")
        self.att_global = nn.Dense(
            self.attention_bottleneck, use_bias=False, name="att_global"
        )
        self.att_scores = nn.Dense(3 * self.channels, name="att2")
        self.embedding = nn.Dense(self.embedding_dim, name="embedding")

    def __call__(
        self, waveform: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.head(self.trunk(waveform), weights)

    def trunk(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(batch, 1, samples) -> (batch, frames, 3*channels)."""
        feats = log_mel_filterbank(
            waveform[:, 0, :], num_mels=self.num_mels, sample_rate=self.sample_rate
        )
        # per-utterance mean normalization (speechbrain's input norm)
        feats = feats - jnp.mean(feats, axis=1, keepdims=True)
        x = self.stem(feats)
        b1 = self.block1(x)
        b2 = self.block2(b1)
        b3 = self.block3(b2)
        cat = jnp.concatenate([b1, b2, b3], axis=-1)
        return nn.relu(self.mfa(cat))

    def head(
        self, frames: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """frames (B, T, C); weights (B, S, Tw) -> (B, S, dim)."""
        squeeze = weights is None
        if weights is None:
            weights = jnp.ones(frames.shape[:1] + (1, frames.shape[1]), frames.dtype)
        # nearest-resample external weights to the fbank frame grid
        src = weights.shape[-1]
        T = frames.shape[1]
        if src != T:
            idx = (jnp.arange(T) * src) // T
            weights = jnp.take(weights, idx, axis=-1)

        # Channel- and context-dependent attention, computed ONCE per chunk
        # (no speaker axis): hidden = tanh(W_l f_t + W_g [mean; std] + b).
        gmean = jnp.mean(frames, axis=1, keepdims=True)
        gstd = jnp.std(frames, axis=1, keepdims=True)
        hidden = jnp.tanh(
            self.att_local(frames)
            + self.att_global(jnp.concatenate([gmean, gstd], axis=-1))
        )  # (B, T, bottleneck)
        alpha = jax.nn.softmax(self.att_scores(hidden), axis=1)  # (B, T, C)

        # Per-speaker pooling: external weights re-normalize the shared
        # attention per speaker — alpha_s(t,c) ∝ alpha(t,c) * w_s(t). All
        # speaker fan-out happens inside einsum contractions, so no
        # (B, S, T, C) tensor is ever materialized.
        af = alpha * frames
        af2 = alpha * frames**2
        den = jnp.maximum(jnp.einsum("btc,bst->bsc", alpha, weights), 1e-8)
        mu = jnp.einsum("btc,bst->bsc", af, weights) / den
        var = jnp.einsum("btc,bst->bsc", af2, weights) / den - mu**2
        sg = jnp.sqrt(jnp.maximum(var, 1e-8))
        pooled = jnp.concatenate([mu, sg], axis=-1)  # (B, S, 2C)
        emb = self.embedding(pooled)
        return emb[:, 0] if squeeze else emb
