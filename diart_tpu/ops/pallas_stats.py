"""Pallas TPU kernel: fused final-TDNN projection + weighted statistics.

The x-vector head's hot tail is ``tdnn4 -> leaky_relu -> batch-norm ->
weighted moments`` (``models/embedding.py``). Left to XLA, the projection
materializes TWO (batch, frames, 1500) activations in HBM (the values and
their squares), then relayouts both for the pooling contractions — at batch
256 that is ~430 MB written + ~860 MB re-read per 0.5 s hop, measured at
~2.5 ms/step on v5e (the largest single block of the engine step after the
frontend).

This kernel computes the projection one (batch-rows, channel-tile) block at
a time and contracts it against the per-speaker weights *while it is still
in VMEM*:

    Y = leaky(X @ W + b)        (frames, channel_tile)  on the MXU
    Z = a * Y + c               (inference batch-norm, folded affine)
    s1 = weights @ Z            (speakers, channel_tile) on the MXU
    s2 = weights @ Z**2

so HBM sees only the (batch, frames, 512) input once and the two tiny
(batch, speakers, 1500) moment tensors — >30x less traffic. The weighted
mean/std are then assembled from (s1, s2) on the XLA side
(:func:`diart_tpu.models.embedding.weighted_stats_pool` semantics,
reliability-weighted unbiased variance).

Reference behavior being fused: pyannote's XVectorSincNet final TDNN block +
``StatsPool`` (loaded by ``/root/reference/src/diart/models.py:42-59``);
bit-parity with the unfused path is covered by ``tests/test_pallas_stats.py``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_linear_stats", "linear_stats_reference"]


@lru_cache(maxsize=None)
def _with_vjp(negative_slope: float, interpret: bool):
    """Differentiable wrapper: the Pallas kernel computes the forward; the
    backward differentiates the unfused reference formulation (pallas_call
    itself has no autodiff rule, and training must work with the TPU fast
    path enabled)."""

    @jax.custom_vjp
    def run(x, w, b, scale, shift, weights):
        return _run_kernel(x, w, b, scale, shift, weights, negative_slope, interpret)

    def fwd(x, w, b, scale, shift, weights):
        return run(x, w, b, scale, shift, weights), (x, w, b, scale, shift, weights)

    def bwd(residuals, cotangents):
        _, vjp = jax.vjp(
            lambda *args: linear_stats_reference(*args, negative_slope), *residuals
        )
        return vjp(cotangents)

    run.defvjp(fwd, bwd)
    return run


def _round_up(value: int, multiple: int) -> int:
    return (value + multiple - 1) // multiple * multiple


def linear_stats_reference(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    weights: jnp.ndarray,
    negative_slope: float = 0.01,
):
    """Unfused jnp oracle of the kernel (used by parity tests and any
    non-TPU backend): returns ``(s1, s2)`` weighted first/second moments of
    ``affine(leaky(x @ w + b))``.

    x: (B, T, C_in); w: (C_in, C); b/scale/shift: (C,);
    weights: (B, S, T) -> s1, s2: (B, S, C) float32.
    """
    y = jnp.einsum("btc,cd->btd", x, w, preferred_element_type=jnp.float32)
    y = y + b.astype(jnp.float32)
    y = jnp.where(y >= 0, y, negative_slope * y)
    z = y * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    wt = weights.astype(jnp.float32)
    s1 = jnp.einsum("btd,bst->bsd", z, wt, preferred_element_type=jnp.float32)
    s2 = jnp.einsum("btd,bst->bsd", z * z, wt, preferred_element_type=jnp.float32)
    return s1, s2


def _stats_kernel(
    x_ref, w_ref, b_ref, a_ref, c_ref, wt_ref, s1_ref, s2_ref, *, rows, slope
):
    """One (batch-rows, channel-tile) cell. All refs in VMEM:
    x (rows, T, C_in), w (C_in, CT), b/a/c (1, CT), wt (rows, S, T),
    s1/s2 (rows, S, CT)."""
    w = w_ref[...]
    bias = b_ref[...]
    scale = a_ref[...]
    shift = c_ref[...]
    for r in range(rows):  # static unroll: independent MXU passes per row
        y = jax.lax.dot_general(
            x_ref[r],
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + bias
        y = jnp.where(y >= 0, y, slope * y)
        z = y * scale + shift  # (T, CT) f32, lives only in VMEM
        wt = wt_ref[r]  # (S, T) f32
        dims = (((1,), (0,)), ((), ()))
        s1_ref[r] = jax.lax.dot_general(
            wt, z, dimension_numbers=dims, preferred_element_type=jnp.float32
        )
        s2_ref[r] = jax.lax.dot_general(
            wt, z * z, dimension_numbers=dims, preferred_element_type=jnp.float32
        )


@partial(jax.jit, static_argnames=("negative_slope", "interpret"))
def fused_linear_stats(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    weights: jnp.ndarray,
    negative_slope: float = 0.01,
    interpret: bool = None,
):
    """Weighted first/second moments of ``affine(leaky(x @ w + b))`` without
    materializing the projected activations.

    ``interpret=None`` resolves to compiled on TPU backends and interpreter
    mode elsewhere (compiled Pallas only lowers for TPU). Differentiable:
    gradients flow through the unfused reference formulation.

    Parameters
    ----------
    x: (B, T, C_in) trunk activations (f32 or bf16; accumulation is f32).
    w: (C_in, C) projection weights; b: (C,) projection bias.
    scale / shift: (C,) folded inference batch-norm affine
        (``scale = gamma * rsqrt(var + eps)``, ``shift = beta - mean*scale``).
    weights: (B, S, T) non-negative per-speaker frame weights.

    Returns
    -------
    (s1, s2): (B, S, C) float32 — ``sum_t weights * z`` and
    ``sum_t weights * z**2``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _with_vjp(negative_slope, interpret)(x, w, b, scale, shift, weights)


def _run_kernel(x, w, b, scale, shift, weights, negative_slope, interpret):
    batch, time, c_in = x.shape
    _, speakers, wt_time = weights.shape
    assert wt_time == time, f"weights time {wt_time} != frames time {time}"
    assert w.shape[0] == c_in
    channels = w.shape[1]

    # channel tiling: zero-padded tail tile (affine of 0 stays 0 because the
    # padded scale/shift are 0, so padded moment columns are exactly 0)
    c_tile = 512 if channels >= 512 else _round_up(channels, 128)
    c_pad = _round_up(channels, c_tile)
    # batch rows per grid cell: biggest power-of-two divisor up to 8
    rows = 8
    while batch % rows:
        rows //= 2

    wp = jnp.pad(w, ((0, 0), (0, c_pad - channels))).astype(x.dtype)
    pad1 = lambda v: jnp.pad(v.astype(jnp.float32), (0, c_pad - channels))[None, :]
    wt = weights.astype(jnp.float32)

    grid = (batch // rows, c_pad // c_tile)
    kernel = partial(_stats_kernel, rows=rows, slope=negative_slope)
    s1, s2 = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((batch, speakers, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((batch, speakers, c_pad), jnp.float32),
        ),
        in_specs=[
            # x / weights blocks depend only on the batch index, and the
            # channel axis iterates fastest, so Mosaic re-uses them across
            # the inner channel sweep instead of re-fetching
            pl.BlockSpec((rows, time, c_in), lambda ib, ic: (ib, 0, 0)),
            pl.BlockSpec((c_in, c_tile), lambda ib, ic: (0, ic)),
            pl.BlockSpec((1, c_tile), lambda ib, ic: (0, ic)),
            pl.BlockSpec((1, c_tile), lambda ib, ic: (0, ic)),
            pl.BlockSpec((1, c_tile), lambda ib, ic: (0, ic)),
            pl.BlockSpec((rows, speakers, time), lambda ib, ic: (ib, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rows, speakers, c_tile), lambda ib, ic: (ib, 0, ic)),
            pl.BlockSpec((rows, speakers, c_tile), lambda ib, ic: (ib, 0, ic)),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=int(6e7),
        ),
    )(x, wp, pad1(b), pad1(scale), pad1(shift), wt)
    return s1[..., :channels], s2[..., :channels]
