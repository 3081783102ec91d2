"""TitaNet speaker embedding model, in JAX/flax.

Native equivalent of ``nvidia/speakerverification_en_titanet_large``, the
last embedding family in the reference's model table
(``/root/reference/README.md:178``; served there through pyannote's
``PretrainedSpeakerEmbedding`` + NeMo). Architecture per Koluguri et al.
2021 and the NeMo ``titanet-large`` recipe: mel frontend, a ContextNet-style
encoder of 1D time-channel separable conv blocks with global-context
squeeze-excitation (prologue k=3; three residual mega-blocks k=7/11/15 with
repeat 3; epilogue k=1 to 3*channels), and channel-attentive statistics
pooling into a linear embedding.

Trunk/head split as in :mod:`diart_tpu.models.embedding`; external
per-speaker frame weights re-normalize the shared attention per speaker
(the same treatment as our ECAPA head — TitaNet has no weighted pooling
natively).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fbank import log_mel_filterbank

__all__ = ["TitaNet"]


class _BatchNorm(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return scale * (x - mean) * jax.lax.rsqrt(var + 1e-5) + bias


class _SeparableConvBnRelu(nn.Module):
    """One repeat: depthwise conv (k) -> pointwise 1x1 -> BN [-> relu]."""

    features: int
    kernel: int
    relu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            x.shape[-1],
            kernel_size=(self.kernel,),
            padding=[(pad, pad)],
            feature_group_count=x.shape[-1],
            use_bias=False,
            name="dw",
        )(x)
        x = nn.Conv(self.features, kernel_size=(1,), use_bias=False, name="pw")(x)
        x = _BatchNorm(self.features, name="bn")(x)
        return nn.relu(x) if self.relu else x


class _SqueezeExcite(nn.Module):
    """Global-context squeeze-excitation (NeMo se_context_size=-1)."""

    features: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, C)
        s = nn.relu(nn.Dense(self.features // self.reduction, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(self.features, name="fc2")(s))
        return x * s


class _TitaBlock(nn.Module):
    """ContextNet mega block: ``repeat`` separable convs, SE, residual."""

    features: int
    kernel: int
    repeat: int = 1
    residual: bool = True
    se_reduction: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        for r in range(self.repeat):
            x = _SeparableConvBnRelu(
                self.features,
                self.kernel,
                relu=(r < self.repeat - 1),
                name=f"rep{r}",
            )(x)
        x = _SqueezeExcite(self.features, self.se_reduction, name="se")(x)
        if self.residual:
            res = nn.Conv(
                self.features, kernel_size=(1,), use_bias=False, name="res_conv"
            )(inp)
            res = _BatchNorm(self.features, name="res_bn")(res)
            x = x + res
        return nn.relu(x)


class TitaNet(nn.Module):
    """TitaNet with external-weight-aware attentive statistics pooling.

    Defaults follow the titanet-large recipe (channels 1024, epilogue 3072,
    192-dim embeddings); ``channels`` scales the whole encoder for the
    smaller variants.
    """

    embedding_dim: int = 192
    channels: int = 1024
    mega_kernels: Tuple[int, ...] = (7, 11, 15)
    repeat: int = 3
    num_mels: int = 80
    sample_rate: int = 16000
    attention_bottleneck: int = 128

    def setup(self):
        c = self.channels
        self.prologue = _TitaBlock(c, 3, repeat=1, residual=False, name="prologue")
        self.megas = [
            _TitaBlock(c, k, repeat=self.repeat, residual=True, name=f"mega{i}")
            for i, k in enumerate(self.mega_kernels)
        ]
        self.epilogue = _TitaBlock(3 * c, 1, repeat=1, residual=False, name="epilogue")
        # channel-attentive stats pooling (attention over [x; mean; std],
        # split into local/global matmuls as in our ECAPA head)
        self.att_local = nn.Dense(self.attention_bottleneck, name="att_local")
        self.att_global = nn.Dense(
            self.attention_bottleneck, use_bias=False, name="att_global"
        )
        self.att_bn = _BatchNorm(self.attention_bottleneck, name="att_bn")
        self.att_scores = nn.Dense(3 * c, name="att2")
        self.emb_bn = _BatchNorm(6 * c, name="emb_bn")
        self.embedding = nn.Dense(self.embedding_dim, name="embedding")

    def __call__(
        self, waveform: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.head(self.trunk(waveform), weights)

    def features(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(batch, 1, samples) -> (batch, frames, num_mels): log-mel with
        per-feature normalization (NeMo's per_feature preprocessor norm)."""
        feats = log_mel_filterbank(
            waveform[:, 0, :], num_mels=self.num_mels, sample_rate=self.sample_rate
        )
        mean = jnp.mean(feats, axis=1, keepdims=True)
        std = jnp.std(feats, axis=1, keepdims=True) + 1e-5
        return (feats - mean) / std

    def trunk(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return self.trunk_from_features(self.features(waveform))

    def trunk_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(batch, frames, num_mels) -> (batch, frames, 3*channels)."""
        x = self.prologue(feats)
        for mega in self.megas:
            x = mega(x)
        return self.epilogue(x)

    def head(
        self, frames: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """frames (B, T, 3C); weights (B, S, Tw) -> (B, S, dim)."""
        squeeze = weights is None
        if weights is None:
            weights = jnp.ones(frames.shape[:1] + (1, frames.shape[1]), frames.dtype)
        src = weights.shape[-1]
        t = frames.shape[1]
        if src != t:
            idx = (jnp.arange(t) * src) // t
            weights = jnp.take(weights, idx, axis=-1)

        gmean = jnp.mean(frames, axis=1, keepdims=True)
        gvar = jnp.mean((frames - gmean) ** 2, axis=1, keepdims=True)
        gstd = jnp.sqrt(jnp.maximum(gvar, 1e-12))
        hidden = self.att_local(frames) + self.att_global(
            jnp.concatenate([gmean, gstd], axis=-1)
        )
        hidden = jnp.tanh(self.att_bn(nn.relu(hidden)))
        alpha = jax.nn.softmax(self.att_scores(hidden), axis=1)  # (B, T, 3C)

        af = alpha * frames
        af2 = alpha * frames**2
        den = jnp.maximum(jnp.einsum("btc,bst->bsc", alpha, weights), 1e-12)
        mu = jnp.einsum("btc,bst->bsc", af, weights) / den
        var = jnp.einsum("btc,bst->bsc", af2, weights) / den - mu**2
        sg = jnp.sqrt(jnp.maximum(var, 1e-12))
        pooled = jnp.concatenate([mu, sg], axis=-1)  # (B, S, 6C)
        emb = self.embedding(self.emb_bn(pooled))
        return emb[:, 0] if squeeze else emb
