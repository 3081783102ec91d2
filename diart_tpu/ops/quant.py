"""Dynamic int8 quantization for FLOP-bound embedding trunk convolutions.

The conv-heavy embedding families (wespeaker ResNet34, and to a lesser
degree the TDNN trunks) run near the bf16 matmul roofline on TPU —
ResNet34 measures >50% MFU at batch 256 (PERF.md), so further gains need a
faster multiply, not better scheduling. TPU MXUs execute s8 x s8 -> s32 at
2x the bf16 rate (v5e: 394 TOPS int8 vs 197 TFLOPS bf16), which XLA
reaches through integer convolutions with ``preferred_element_type=int32``.

Scheme: **dynamic symmetric quantization** — no calibration data, no
checkpoint changes, exact f32 parameters stay the source of truth:

* activations: per-SAMPLE scale ``s_x = max|x| / 127`` (a single reduction
  per conv input, fused by XLA into the producing op's epilogue);
* weights: per-OUTPUT-CHANNEL scales ``s_w[c] = max|w[..., c]| / 127``
  (computed from the f32 parameters at trace time — constant-folded into
  the executable when parameters are donated/frozen);
* accumulate in int32, dequantize with the rank-broadcast product
  ``s_x * s_w`` and proceed in f32 (batch-norm folding, residual adds and
  pooling statistics are unchanged).

Uniform-quantization error is ~1% RMS per tensor (7 effective bits with a
max-abs scale); through a ResNet34 trunk the pooled-embedding cosine stays
> 0.999 (``tests/test_quant.py``), well inside the clustering threshold
margin (δ_new defaults to 1.0 in cosine distance, reference
``/root/reference/src/diart/blocks/diarization.py``). Still, it IS a
quality-affecting approximation, so the ``int8_trunk`` precision switch
defaults OFF.

Differentiable via the STRAIGHT-THROUGH estimator (the standard QAT
treatment): rounding has zero gradient almost everywhere, so the backward
pass is the exact f32 convolution's VJP at the unquantized operands — the
same fast-forward/reference-backward pattern as the Pallas kernels
(``ops/pallas_*.py``). Fine-tuning with the fast path on therefore trains
the f32 master weights while the forward sees quantization noise.

Reference behavior being accelerated: the embedding model forwards the
reference runs in torch/ONNX (``/root/reference/src/diart/models.py:
240-265``); int8 serving of those exact checkpoints is a capability the
reference does not have.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["int8_conv", "quantize_per_sample", "quantize_weight"]

_EPS = 1e-12


def quantize_per_sample(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization with one scale per leading-axis sample.

    x: (batch, ...) float -> (q int8 same shape, scale (batch, 1, ..., 1)
    f32) with ``x ≈ q * scale``.
    """
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(range(1, x.ndim))
    amax = jnp.max(jnp.abs(xf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization with one scale per OUTPUT channel (the
    trailing axis, flax convention: kernel (..., in, out))."""
    wf = w.astype(jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes)
    scale = jnp.maximum(amax, _EPS) / 127.0  # (out,)
    q = jnp.clip(jnp.round(wf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _conv_specs(spatial: int) -> Tuple[str, str, str]:
    lhs_spec = "N" + "HWD"[:spatial] + "C"
    return lhs_spec, "HWD"[:spatial] + "IO", lhs_spec


def _int8_conv_forward(x, kernel, strides, padding, dilation, out_dtype):
    q_x, s_x = quantize_per_sample(x)
    q_w, s_w = quantize_weight(kernel)
    acc = lax.conv_general_dilated(
        q_x,
        q_w,
        strides,
        list(padding),
        rhs_dilation=dilation,
        dimension_numbers=_conv_specs(kernel.ndim - 2),
        preferred_element_type=jnp.int32,
    )
    # s_x broadcasts over batch (keepdims rank), s_w over the channel axis
    return (acc.astype(jnp.float32) * (s_x * s_w)).astype(out_dtype)


@lru_cache(maxsize=None)
def _with_ste_vjp(strides: Tuple[int, ...], padding, dilation, out_dtype):
    """int8 forward, straight-through (exact f32 conv VJP) backward."""

    def f32_conv(x, kernel):
        return lax.conv_general_dilated(
            x.astype(jnp.float32),
            kernel.astype(jnp.float32),
            strides,
            list(padding),
            rhs_dilation=dilation,
            dimension_numbers=_conv_specs(kernel.ndim - 2),
        ).astype(out_dtype)

    @jax.custom_vjp
    def run(x, kernel):
        return _int8_conv_forward(x, kernel, strides, padding, dilation, out_dtype)

    def fwd(x, kernel):
        return run(x, kernel), (x, kernel)

    def bwd(residuals, cotangent):
        _, vjp = jax.vjp(f32_conv, *residuals)
        return vjp(cotangent)

    run.defvjp(fwd, bwd)
    return run


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Sequence[int],
    padding: Sequence[Tuple[int, int]],
    out_dtype: jnp.dtype = jnp.float32,
    dilation: Sequence[int] = None,
) -> jnp.ndarray:
    """Dynamically-quantized convolution: f32/bf16 in, f32/bf16 out, int8
    multiplies inside, straight-through gradients.

    x: (batch, *spatial, in_ch); kernel: (*window, in_ch, out_ch) — the
    flax ``nn.Conv`` NHWC/HWIO layout for any spatial rank lax supports.
    ``dilation`` is the kernel (rhs) dilation.
    """
    padding = tuple((int(lo), int(hi)) for lo, hi in padding)
    dilation = tuple(
        int(d) for d in (dilation or (1,) * (kernel.ndim - 2))
    )
    return _with_ste_vjp(
        tuple(int(s) for s in strides), padding, dilation, out_dtype
    )(x, kernel)
