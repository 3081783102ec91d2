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

Uniform-quantization error is ~0.3% RMS per tensor (7 effective bits);
through a ResNet34 trunk the pooled-embedding cosine stays > 0.999
(``tests/test_quant.py``), well inside the clustering threshold margin
(δ_new defaults to 1.0 in cosine distance, reference
``/root/reference/src/diart/blocks/diarization.py``). Still, it IS a
quality-affecting approximation, so the ``int8_trunk`` precision switch
defaults OFF and is inference-only (no custom VJP: rounding has zero
gradient almost everywhere — training paths must keep it disabled).

Reference behavior being accelerated: the embedding model forwards the
reference runs in torch/ONNX (``/root/reference/src/diart/models.py:
240-265``); int8 serving of those exact checkpoints is a capability the
reference does not have.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

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


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Sequence[int],
    padding: Union[str, Sequence[Tuple[int, int]]],
    out_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Dynamically-quantized convolution: f32/bf16 in, f32/bf16 out, int8
    multiplies inside.

    x: (batch, *spatial, in_ch); kernel: (*window, in_ch, out_ch) — the
    flax ``nn.Conv`` NHWC/HWIO layout for any spatial rank lax supports.
    """
    q_x, s_x = quantize_per_sample(x)
    q_w, s_w = quantize_weight(kernel)
    spatial = kernel.ndim - 2
    lhs_spec = "N" + "HWD"[:spatial] + "C"
    rhs_spec = "HWD"[:spatial] + "IO"
    acc = lax.conv_general_dilated(
        q_x,
        q_w,
        tuple(strides),
        padding if isinstance(padding, str) else list(padding),
        dimension_numbers=(lhs_spec, rhs_spec, lhs_spec),
        preferred_element_type=jnp.int32,
    )
    # s_x broadcasts over batch (keepdims rank), s_w over the channel axis
    return (acc.astype(jnp.float32) * (s_x * s_w)).astype(out_dtype)
