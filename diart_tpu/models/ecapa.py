"""ECAPA-TDNN speaker embedding model, in JAX/flax.

Native equivalent of the ``speechbrain/spkrec-ecapa-voxceleb`` family the
reference supports through pyannote's ``PretrainedSpeakerEmbedding``
(``/root/reference/src/diart/models.py:59``; latency table
``README.md:175``). The compute graph follows speechbrain's
``lobes.models.ECAPA_TDNN`` exactly (verified against a faithful torch
replica in ``tests/test_convert.py``): log-mel frontend + per-utterance mean
normalization, TDNN stem, three SE-Res2Blocks (dilation 2/3/4), multi-layer
feature aggregation, channel- and context-dependent attentive statistics
pooling with a BN'd attention bottleneck, post-pooling BatchNorm, and a
linear projection to the embedding space — so real speechbrain checkpoints
convert weight-for-weight (:func:`diart_tpu.models.convert.
ecapa_params_from_state_dict`).

Trunk/head split as in :mod:`diart_tpu.models.embedding`: the convolutional
trunk runs once per chunk, the attentive-pooling head fans out per speaker.
External per-speaker frame weights multiply the attention scores — models of
this family have no weighted pooling natively, which is why the reference
exposes ``normalize_embedding_weights`` for them (``blocks/embedding.py:
87-90``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import InferenceBatchNorm as _BatchNorm
from .common import QuantizableConv, attentive_stats_pool, reflect_pad_time
from .fbank import speechbrain_log_mel

__all__ = ["EcapaTDNN"]


class _TDNNBlock(nn.Module):
    """speechbrain TDNNBlock: Conv1d -> ReLU -> BatchNorm1d.

    The conv is 'same' with REFLECT padding (speechbrain's ``Conv1d``
    default ``padding_mode="reflect"``), see
    :func:`diart_tpu.models.common.reflect_pad_time`."""

    features: int
    kernel: int = 1
    dilation: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel - 1) * self.dilation // 2
        x = QuantizableConv(
            self.features,
            kernel_size=(self.kernel,),
            kernel_dilation=(self.dilation,),
            use_bias=True,
            compute_dtype=self.compute_dtype,
            name="conv",
        )(reflect_pad_time(x, pad))
        return _BatchNorm(self.features, name="bn")(nn.relu(x))


class _Res2Block(nn.Module):
    """speechbrain Res2NetBlock: channels split into ``scale`` groups; group
    i >= 2 sees the previous group's output added to its input; each group
    conv is a full TDNNBlock (conv+relu+BN)."""

    features: int
    kernel: int
    dilation: int
    scale: int = 8
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        width = self.features // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        outputs = [chunks[0]]
        y = None
        for i in range(1, self.scale):
            inp = chunks[i] if y is None else chunks[i] + y
            y = _TDNNBlock(
                width, self.kernel, self.dilation,
                compute_dtype=self.compute_dtype, name=f"block{i - 1}",
            )(inp)
            outputs.append(y)
        return jnp.concatenate(outputs, axis=-1)


class _SEBlock(nn.Module):
    """Squeeze-and-excitation over channels (1x1 convs as in speechbrain)."""

    features: int
    bottleneck: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # squeeze statistics + gate MLP in f32 (time-mean accumulation);
        # the excitation multiply stays in the trunk dtype
        s = jnp.mean(x.astype(jnp.float32), axis=1, keepdims=True)  # (B, 1, C)
        s = nn.relu(nn.Dense(self.bottleneck, name="conv1")(s))
        s = nn.sigmoid(nn.Dense(self.features, name="conv2")(s))
        return x * s.astype(x.dtype)


class _SERes2Block(nn.Module):
    features: int
    kernel: int
    dilation: int
    res2_scale: int = 8
    se_bottleneck: int = 128
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        # setup-style (attribute names set the param paths — identical to
        # the previous compact layout) so the fused path can read submodule
        # parameters without calling them, as the x-vector fused head does
        dt = self.compute_dtype
        self.tdnn1 = _TDNNBlock(self.features, 1, 1, compute_dtype=dt)
        self.res2net = _Res2Block(
            self.features, self.kernel, self.dilation, self.res2_scale,
            compute_dtype=dt,
        )
        self.tdnn2 = _TDNNBlock(self.features, 1, 1, compute_dtype=dt)
        self.se = _SEBlock(self.features, self.se_bottleneck)

    def _fused(self) -> bool:
        """Whether the whole block runs as one Pallas kernel
        (ops/pallas_res2.py) instead of 17+ XLA ops bouncing (B, T, C)
        intermediates through HBM. ON by default on TPU
        (``DIART_TPU_PALLAS_RES2=0`` opts out); during ``init`` the standard
        path runs so every parameter is created."""
        from .. import precision

        return (
            precision.enabled("pallas_res2")
            and not self.is_initializing()
            and self.features % self.res2_scale == 0
        )

    def _folded_params(self):
        """Extract + fold the block's parameters into the kernel's 16-tuple
        (inference batch norms become ``a = scale*rsqrt(var+eps)``,
        ``c = bias - mean*a`` affines, exactly as InferenceBatchNorm)."""
        fold = lambda p: (
            p["scale"] * jax.lax.rsqrt(p["var"] + 1e-5),
            p["bias"] - p["mean"] * p["scale"] * jax.lax.rsqrt(p["var"] + 1e-5),
        )
        t1 = self.tdnn1.variables["params"]
        a1, c1 = fold(t1["bn"])
        t2 = self.tdnn2.variables["params"]
        a2, c2 = fold(t2["bn"])
        rp = self.res2net.variables["params"]
        wg, bg, ag, cg = [], [], [], []
        for i in range(self.res2_scale - 1):
            blk = rp[f"block{i}"]
            wg.append(blk["conv"]["kernel"])  # (K, W, W)
            bg.append(blk["conv"]["bias"])
            gai, gci = fold(blk["bn"])
            ag.append(gai)
            cg.append(gci)
        se = self.se.variables["params"]
        return (
            t1["conv"]["kernel"][0],
            t1["conv"]["bias"],
            a1,
            c1,
            jnp.stack(wg),
            jnp.stack(bg),
            jnp.stack(ag),
            jnp.stack(cg),
            t2["conv"]["kernel"][0],
            t2["conv"]["bias"],
            a2,
            c2,
            se["conv1"]["kernel"],
            se["conv1"]["bias"],
            se["conv2"]["kernel"],
            se["conv2"]["bias"],
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._fused():
            from ..ops.pallas_res2 import fused_se_res2_block

            return fused_se_res2_block(x, self._folded_params(), self.dilation)
        residual = x
        x = self.tdnn1(x)
        x = self.res2net(x)
        x = self.tdnn2(x)
        x = self.se(x)
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
    res2_scale: int = 8
    se_bottleneck: int = 128
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c, dt = self.channels, self.compute_dtype
        self.stem = _TDNNBlock(c, 5, 1, compute_dtype=dt, name="stem")
        self.block1 = _SERes2Block(c, 3, 2, self.res2_scale, self.se_bottleneck, dt, name="block1")
        self.block2 = _SERes2Block(c, 3, 3, self.res2_scale, self.se_bottleneck, dt, name="block2")
        self.block3 = _SERes2Block(c, 3, 4, self.res2_scale, self.se_bottleneck, dt, name="block3")
        self.mfa = _TDNNBlock(3 * c, 1, 1, compute_dtype=dt, name="mfa")
        # speechbrain ASP: TDNNBlock(9C -> bottleneck) on [x; mean; std],
        # tanh, 1x1 conv -> per-channel attention logits. The TDNNBlock's
        # conv over the concat is computed as split local/global matmuls so
        # no (B, T, 9C) tensor is materialized.
        self.att_local = nn.Dense(self.attention_bottleneck, name="att_local")
        self.att_global = nn.Dense(
            self.attention_bottleneck, use_bias=False, name="att_global"
        )
        self.att_bn = _BatchNorm(self.attention_bottleneck, name="att_bn")
        self.att_scores = nn.Dense(3 * c, name="att2")
        self.asp_bn = _BatchNorm(6 * c, name="asp_bn")
        self.embedding = nn.Dense(self.embedding_dim, name="embedding")

    def __call__(
        self, waveform: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.head(self.trunk(waveform), weights)

    def features(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(batch, 1, samples) -> (batch, frames, num_mels) normalized fbanks
        (speechbrain Fbank + per-utterance mean InputNormalization)."""
        feats = speechbrain_log_mel(
            waveform[:, 0, :], num_mels=self.num_mels, sample_rate=self.sample_rate
        )
        return feats - jnp.mean(feats, axis=1, keepdims=True)

    # incremental-frontend protocol (engine fbank_ring; models/fbank.py)
    fbank_ring_kind = "speechbrain"

    def finalize_fbank(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Window-dependent tail of ``features``: the top_db floor of
        ``speechbrain_log_mel`` plus the per-utterance mean norm."""
        floor = jnp.max(raw, axis=(1, 2), keepdims=True) - 80.0
        x = jnp.maximum(raw, floor)
        return x - jnp.mean(x, axis=1, keepdims=True)

    def trunk_from_raw_fbank(self, raw: jnp.ndarray) -> jnp.ndarray:
        return self.trunk_from_features(self.finalize_fbank(raw))

    def trunk(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(batch, 1, samples) -> (batch, frames, 3*channels)."""
        return self.trunk_from_features(self.features(waveform))

    def trunk_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(batch, frames, num_mels) -> (batch, frames, 3*channels).

        Runs in ``compute_dtype`` (bf16 keeps the MXU on its fast path; the
        fbank frontend and the pooling-head statistics stay f32 — embeddings
        only feed cosine distances for clustering)."""
        x = self.stem(feats.astype(self.compute_dtype))
        b1 = self.block1(x)
        b2 = self.block2(b1)
        b3 = self.block3(b2)
        cat = jnp.concatenate([b1, b2, b3], axis=-1)
        return self.mfa(cat)

    def head(
        self, frames: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """frames (B, T, C); weights (B, S, Tw) -> (B, S, dim)."""
        # speechbrain's tanh(BN(relu(W [x; mean; std]))) attention with
        # biased global std (eps=1e-12 clamp), shared with the TitaNet head.
        pooled, squeeze = attentive_stats_pool(
            frames, weights, self.att_local, self.att_global,
            self.att_bn, self.att_scores,
        )  # (B, S, 2C)
        emb = self.embedding(self.asp_bn(pooled))
        return emb[:, 0] if squeeze else emb
