"""Building blocks shared by the embedding model families.

One definition each for the pieces every converted-checkpoint architecture
needs — inference-form batch norm, and the external-weight-aware attentive
statistics pooling used by the ECAPA and TitaNet heads — so a convention fix
(an epsilon, a rounding rule) lands in every family at once.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "InferenceBatchNorm",
    "QuantizableConv",
    "attentive_stats_pool",
    "int8_trunk_enabled",
    "pallas_enabled",
    "reflect_pad_time",
    "resample_weights",
]


def reflect_pad_time(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the time axis of a (batch, time, channels) activation.

    speechbrain's ``Conv1d`` defaults to ``padding="same",
    padding_mode="reflect"`` (``speechbrain.nnet.CNN.Conv1d``), so every
    'same' convolution in its model zoo — the ECAPA-TDNN and x-vector
    families the reference loads via ``PretrainedSpeakerEmbedding``
    (``/root/reference/src/diart/models.py:59``) — reflects at chunk edges
    rather than zero-padding. Matching it matters for checkpoint fidelity:
    the boundary frames feed the pooled statistics every embedding is built
    from."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


def pallas_enabled(env_var: str) -> bool:
    """Legacy gate for a TPU-only fast path, kept for backward
    compatibility: resolves through the explicit precision policy
    (:mod:`diart_tpu.precision`), where the env var remains an override."""
    from .. import precision

    field = {v: k for k, v in precision._ENV_VARS.items()}[env_var]
    return precision.enabled(field)


def resample_weights(weights: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """Nearest-neighbor resample of per-frame weights to the trunk's frame
    grid (pyannote's StatsPool interpolates the same way)."""
    src = weights.shape[-1]
    if src == num_frames:
        return weights
    idx = (jnp.arange(num_frames) * src) // num_frames
    return jnp.take(weights, idx, axis=-1)


def int8_trunk_enabled() -> bool:
    """Whether the dynamic-int8 trunk fast path applies (ops/quant.py): OFF
    by default (quality-affecting, inference-only), opt-in via
    ``Precision(int8_trunk=True)`` / ``DIART_TPU_INT8_TRUNK=1``."""
    from .. import precision

    return precision.enabled("int8_trunk")


class QuantizableConv(nn.Module):
    """``nn.Conv``-parameter-compatible convolution (kernel
    (*window, in, out), no bias) that executes either as a plain XLA
    convolution in ``compute_dtype`` or, with the ``int8_trunk`` fast path
    on, as a dynamically-quantized s8 x s8 -> s32 convolution
    (:func:`diart_tpu.ops.quant.int8_conv`, 2x the bf16 MXU rate).
    Parameter path/layout is identical either way, so converted checkpoints
    and serialized params are oblivious to the switch. Used for the
    FLOP-dominant trunk convolutions of the conv-heavy embedding families
    (ResNet34 3x3/1x1, TitaNet pointwise); bandwidth-bound convs (depthwise,
    tiny-channel stems) stay in ``compute_dtype``."""

    features: int
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Optional[Tuple[int, ...]] = None
    padding: Optional[Tuple[Tuple[int, int], ...]] = None
    kernel_dilation: Optional[Tuple[int, ...]] = None
    use_bias: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        strides = self.strides or (1,) * len(self.kernel_size)
        padding = list(self.padding or ((0, 0),) * len(self.kernel_size))
        dilation = self.kernel_dilation or (1,) * len(self.kernel_size)
        if int8_trunk_enabled() and not self.is_initializing():
            from ..ops.quant import int8_conv

            y = int8_conv(
                x, kernel, strides, padding, self.compute_dtype, dilation
            )
        else:
            from ..ops.quant import _conv_specs

            dt = self.compute_dtype
            y = jax.lax.conv_general_dilated(
                x.astype(dt),
                kernel.astype(dt),
                strides,
                padding,
                rhs_dilation=dilation,
                dimension_numbers=_conv_specs(len(self.kernel_size)),
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class InferenceBatchNorm(nn.Module):
    """Inference-form batch norm: running statistics live as parameters so
    converted torch checkpoints drop in directly.

    Dtype-preserving: the affine is folded from the f32 parameters
    (``a = scale·rsqrt(var+eps)``, ``b = bias − mean·a``) and applied in the
    input's dtype, so a bf16 trunk stays bf16 across its normalizations
    instead of bouncing every activation through f32 HBM."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        a = scale * jax.lax.rsqrt(var + 1e-5)
        b = bias - mean * a
        return x * a.astype(x.dtype) + b.astype(x.dtype)


def attentive_stats_pool(
    frames: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    att_local: Callable,
    att_global: Callable,
    att_bn: Callable,
    att_scores: Callable,
) -> Tuple[jnp.ndarray, bool]:
    """External-weight-aware channel-attentive statistics pooling.

    The shared math of the ECAPA (speechbrain ``AttentiveStatisticsPooling``)
    and TitaNet (NeMo ``AttentivePoolLayer``) heads: attention over
    ``[x; global mean; global std]`` computed ONCE per chunk (no speaker
    axis), then per-speaker pooling where external per-frame weights
    re-normalize the shared attention — ``alpha_s(t,c) ∝ alpha(t,c) *
    w_s(t)``. Speaker fan-out happens inside einsum contractions, so no
    (B, S, T, C) tensor is ever materialized.

    frames: (B, T, C); weights: (B, S, Tw) or None (uniform single-speaker).
    Returns ``(pooled (B, S, 2C), squeeze)`` where ``squeeze`` tells the
    caller the speaker axis was synthesized and should be dropped.
    """
    squeeze = weights is None
    if weights is None:
        weights = jnp.ones(frames.shape[:1] + (1, frames.shape[1]), frames.dtype)
    weights = resample_weights(weights, frames.shape[1])

    # statistics in f32 regardless of the trunk dtype: long-horizon means /
    # variances accumulate poorly in bf16, and the attention matmuls are a
    # negligible share of the model's FLOPs
    f32 = frames.astype(jnp.float32)
    weights = weights.astype(jnp.float32)
    gmean = jnp.mean(f32, axis=1, keepdims=True)
    gvar = jnp.mean((f32 - gmean) ** 2, axis=1, keepdims=True)
    gstd = jnp.sqrt(jnp.maximum(gvar, 1e-12))
    hidden = att_local(f32) + att_global(
        jnp.concatenate([gmean, gstd], axis=-1)
    )
    hidden = jnp.tanh(att_bn(nn.relu(hidden)))  # (B, T, bottleneck)

    from .. import precision

    if precision.enabled("pallas_attn") and not att_scores.is_initializing():
        # fused path: the per-channel attention is where this head's HBM
        # traffic lives — the (B, T, C) logits/product tensors stay in VMEM
        # (ops/pallas_attn_stats.py); only (B, S, C) moments come back
        from ..ops.pallas_attn_stats import fused_attentive_stats

        params = att_scores.variables["params"]
        den, s1, s2 = fused_attentive_stats(
            frames, hidden, params["kernel"], params["bias"], weights
        )
        den = jnp.maximum(den, 1e-12)
        mu = s1 / den
        var = s2 / den - mu**2
    else:
        alpha = jax.nn.softmax(att_scores(hidden), axis=1)  # (B, T, C)
        af = alpha * f32
        af2 = alpha * f32**2
        pref = dict(preferred_element_type=jnp.float32)
        den = jnp.maximum(
            jnp.einsum("btc,bst->bsc", alpha, weights, **pref), 1e-12
        )
        mu = jnp.einsum("btc,bst->bsc", af, weights, **pref) / den
        var = jnp.einsum("btc,bst->bsc", af2, weights, **pref) / den - mu**2
    sg = jnp.sqrt(jnp.maximum(var, 1e-12))
    return jnp.concatenate([mu, sg], axis=-1), squeeze
