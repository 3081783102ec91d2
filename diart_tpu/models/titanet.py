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
import jax.numpy as jnp

from .common import InferenceBatchNorm as _BatchNorm
from .common import QuantizableConv, attentive_stats_pool
from .fbank import nemo_log_mel

__all__ = ["TitaNet"]


class _SeparableConvBnRelu(nn.Module):
    """One repeat: depthwise conv (k) -> pointwise 1x1 -> BN [-> relu]."""

    features: int
    kernel: int
    relu: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv_kw = dict(
            use_bias=False, dtype=self.compute_dtype, param_dtype=jnp.float32
        )
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            x.shape[-1],
            kernel_size=(self.kernel,),
            padding=[(pad, pad)],
            feature_group_count=x.shape[-1],
            name="dw",
            **conv_kw,
        )(x)
        # the pointwise conv carries the block's FLOPs (C x C matmul over
        # every frame) — int8-able via the shared QuantizableConv; the
        # depthwise conv above is bandwidth-bound and stays in compute_dtype
        x = QuantizableConv(
            self.features, (1,), name="pw", compute_dtype=self.compute_dtype
        )(x)
        x = _BatchNorm(self.features, name="bn")(x)
        return nn.relu(x) if self.relu else x


class _SqueezeExcite(nn.Module):
    """Global-context squeeze-excitation (NeMo se_context_size=-1)."""

    features: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # squeeze statistics + gate MLP in f32 (time-mean accumulation);
        # the excitation multiply stays in the trunk dtype
        s = jnp.mean(x.astype(jnp.float32), axis=1, keepdims=True)  # (B, 1, C)
        s = nn.relu(nn.Dense(self.features // self.reduction, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(self.features, name="fc2")(s))
        return x * s.astype(x.dtype)


class _TitaBlock(nn.Module):
    """ContextNet mega block: ``repeat`` separable convs, SE, residual."""

    features: int
    kernel: int
    repeat: int = 1
    residual: bool = True
    se_reduction: int = 8
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        for r in range(self.repeat):
            x = _SeparableConvBnRelu(
                self.features,
                self.kernel,
                relu=(r < self.repeat - 1),
                compute_dtype=self.compute_dtype,
                name=f"rep{r}",
            )(x)
        x = _SqueezeExcite(self.features, self.se_reduction, name="se")(x)
        if self.residual:
            res = QuantizableConv(
                self.features, (1,), name="res_conv",
                compute_dtype=self.compute_dtype,
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
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, dt = self.channels, self.compute_dtype
        self.prologue = _TitaBlock(
            c, 3, repeat=1, residual=False, compute_dtype=dt, name="prologue"
        )
        self.megas = [
            _TitaBlock(
                c, k, repeat=self.repeat, residual=True, compute_dtype=dt,
                name=f"mega{i}",
            )
            for i, k in enumerate(self.mega_kernels)
        ]
        self.epilogue = _TitaBlock(
            3 * c, 1, repeat=1, residual=False, compute_dtype=dt, name="epilogue"
        )
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
        """(batch, 1, samples) -> (batch, frames, num_mels): NeMo
        ``AudioToMelSpectrogramPreprocessor``-exact log-mel (preemph 0.97,
        centered 512-pt STFT, slaney mel, ``log(x + 2^-24)``) followed by
        NeMo's ``per_feature`` normalization (per-feature mean, *unbiased*
        std + 1e-5)."""
        feats = nemo_log_mel(
            waveform[:, 0, :], num_mels=self.num_mels, sample_rate=self.sample_rate
        )
        mean = jnp.mean(feats, axis=1, keepdims=True)
        t = feats.shape[1]
        var = jnp.sum((feats - mean) ** 2, axis=1, keepdims=True) / max(t - 1, 1)
        return (feats - mean) / (jnp.sqrt(var) + 1e-5)

    # incremental-frontend protocol (engine fbank_ring; models/fbank.py)
    fbank_ring_kind = "nemo"

    def finalize_fbank(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Window-dependent tail of ``features``: NeMo's per-feature mean +
        unbiased-std normalization (the log-mel itself is frame-local and
        lives in the ring)."""
        mean = jnp.mean(raw, axis=1, keepdims=True)
        t = raw.shape[1]
        var = jnp.sum((raw - mean) ** 2, axis=1, keepdims=True) / max(t - 1, 1)
        return (raw - mean) / (jnp.sqrt(var) + 1e-5)

    def trunk_from_raw_fbank(self, raw: jnp.ndarray) -> jnp.ndarray:
        return self.trunk_from_features(self.finalize_fbank(raw))

    def trunk(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return self.trunk_from_features(self.features(waveform))

    def trunk_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(batch, frames, num_mels) -> (batch, frames, 3*channels).

        Runs in ``compute_dtype``; the mel frontend and the pooling-head
        statistics stay f32."""
        x = self.prologue(feats.astype(self.compute_dtype))
        for mega in self.megas:
            x = mega(x)
        return self.epilogue(x)

    def head(
        self, frames: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """frames (B, T, 3C); weights (B, S, Tw) -> (B, S, dim)."""
        pooled, squeeze = attentive_stats_pool(
            frames, weights, self.att_local, self.att_global,
            self.att_bn, self.att_scores,
        )  # (B, S, 6C)
        emb = self.embedding(self.emb_bn(pooled))
        return emb[:, 0] if squeeze else emb
