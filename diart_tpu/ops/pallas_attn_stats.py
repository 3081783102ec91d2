"""Pallas TPU kernel: fused channel-attention + weighted statistics pooling.

The ECAPA / TitaNet head (``models/common.py:attentive_stats_pool``) ends in
``alpha = softmax(att2(hidden))`` followed by three ``btc,bst->bsc``
contractions of ``alpha``, ``alpha*x`` and ``alpha*x**2`` against the
per-speaker frame weights. The attention is *per channel*, so the logits
tensor has the trunk's full (batch, frames, channels) shape — left to XLA,
the step materializes the logits, ``alpha*x`` and ``alpha*x**2`` in HBM and
re-reads a full-size tensor for each contraction: ~8 GB of HBM traffic per
0.5 s hop at batch 256 / 1536 channels, measured at ~11.6 ms of the ECAPA
engine step's 32.8 ms device time (XProf, v5e).

This kernel computes, one (batch-rows, channel-tile) block at a time:

    logits = H @ W2 + b2          (frames, channel_tile)   on the MXU
    alpha  = softmax_t(logits)    (stable, in VMEM)
    den    = weights @ alpha      (speakers, channel_tile)  on the MXU
    s1     = weights @ (alpha*x)
    s2     = weights @ (alpha*x*x)

so HBM sees the trunk activation once (bf16), the small (B, T, bottleneck)
attention hidden state once, and three tiny (B, S, C) moment tensors — the
full-size logits and products never leave VMEM. The weighted mean/std are
assembled from (den, s1, s2) on the XLA side exactly as the unfused
formulation does.

Reference behavior being fused: speechbrain ``AttentiveStatisticsPooling``
/ NeMo ``AttentivePoolLayer`` as wrapped by the reference's embedding
loaders (``/root/reference/src/diart/models.py:59``); parity with the
unfused path is covered by ``tests/test_pallas_attn_stats.py``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attentive_stats", "attentive_stats_reference"]


def _round_up(value: int, multiple: int) -> int:
    return (value + multiple - 1) // multiple * multiple


def attentive_stats_reference(
    x: jnp.ndarray,
    hidden: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    weights: jnp.ndarray,
):
    """Unfused jnp oracle of the kernel (parity tests, non-TPU backends and
    the backward pass): returns ``(den, s1, s2)``.

    x: (B, T, C) trunk activations; hidden: (B, T, H) attention bottleneck;
    w2: (H, C), b2: (C,) attention-score projection; weights: (B, S, T)
    non-negative per-speaker frame weights. All accumulation in float32.
    """
    logits = (
        jnp.einsum(
            "bth,hc->btc", hidden, w2, preferred_element_type=jnp.float32
        )
        + b2
    )
    alpha = jax.nn.softmax(logits, axis=1)
    xf = x.astype(jnp.float32)
    wt = weights.astype(jnp.float32)
    pref = dict(preferred_element_type=jnp.float32)
    den = jnp.einsum("btc,bst->bsc", alpha, wt, **pref)
    s1 = jnp.einsum("btc,bst->bsc", alpha * xf, wt, **pref)
    s2 = jnp.einsum("btc,bst->bsc", alpha * xf * xf, wt, **pref)
    return den, s1, s2


@lru_cache(maxsize=None)
def _with_vjp(interpret: bool):
    """Differentiable wrapper: Pallas forward, reference-formulation
    backward (pallas_call has no autodiff rule; training with the fast path
    on must still produce exact-formula gradients)."""

    @jax.custom_vjp
    def run(x, hidden, w2, b2, weights):
        return _run_kernel(x, hidden, w2, b2, weights, interpret)

    def fwd(x, hidden, w2, b2, weights):
        return run(x, hidden, w2, b2, weights), (x, hidden, w2, b2, weights)

    def bwd(residuals, cotangents):
        _, vjp = jax.vjp(attentive_stats_reference, *residuals)
        return vjp(cotangents)

    run.defvjp(fwd, bwd)
    return run


def _attn_stats_kernel(
    x_ref, h_ref, w2_ref, b2_ref, wt_ref, den_ref, s1_ref, s2_ref, *, rows
):
    """One (batch-rows, channel-tile) cell. All refs in VMEM:
    x (rows, T, CT), h (rows, T, H), w2 (H, CT), b2 (1, CT),
    wt (rows, S, T) f32, den/s1/s2 (rows, S, CT) f32."""
    w2 = w2_ref[...]
    b2 = b2_ref[...]
    for r in range(rows):  # static unroll: independent MXU passes per row
        logits = (
            jax.lax.dot_general(
                h_ref[r],
                w2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2
        )  # (T, CT) f32, lives only in VMEM
        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        alpha = e / jnp.sum(e, axis=0, keepdims=True)
        xf = x_ref[r].astype(jnp.float32)  # (T, CT)
        ax = alpha * xf
        wt = wt_ref[r]  # (S, T) f32
        dims = (((1,), (0,)), ((), ()))
        den_ref[r] = jax.lax.dot_general(
            wt, alpha, dimension_numbers=dims, preferred_element_type=jnp.float32
        )
        s1_ref[r] = jax.lax.dot_general(
            wt, ax, dimension_numbers=dims, preferred_element_type=jnp.float32
        )
        s2_ref[r] = jax.lax.dot_general(
            wt, ax * xf, dimension_numbers=dims, preferred_element_type=jnp.float32
        )


@partial(jax.jit, static_argnames=("interpret",))
def fused_attentive_stats(
    x: jnp.ndarray,
    hidden: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    weights: jnp.ndarray,
    interpret: bool = None,
):
    """``(den, s1, s2)`` of channel-attentive weighted pooling without
    materializing the (B, T, C) attention logits or products.

    ``interpret=None`` resolves to compiled on TPU backends and interpreter
    mode elsewhere. Differentiable: gradients flow through
    :func:`attentive_stats_reference`.

    Parameters
    ----------
    x: (B, T, C) trunk activations (f32 or bf16; accumulation is f32).
    hidden: (B, T, H) attention bottleneck activations (post-tanh).
    w2: (H, C) attention-score projection weights; b2: (C,) its bias.
    weights: (B, S, T) non-negative per-speaker frame weights.

    Returns
    -------
    (den, s1, s2): (B, S, C) float32 — ``sum_t w*alpha``, ``sum_t
    w*alpha*x`` and ``sum_t w*alpha*x**2`` with ``alpha = softmax_t`` of the
    per-channel attention logits.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _with_vjp(interpret)(x, hidden, w2, b2, weights)


def _run_kernel(x, hidden, w2, b2, weights, interpret):
    batch, time, channels = x.shape
    _, ht, bottleneck = hidden.shape
    _, speakers, wt_time = weights.shape
    assert wt_time == time, f"weights time {wt_time} != frames time {time}"
    assert ht == time, f"hidden time {ht} != frames time {time}"
    assert w2.shape == (bottleneck, channels)

    # channel tiling: padded tail channels carry zero weights and zero bias,
    # so their alpha is uniform 1/T but their x is zero — the padded moment
    # columns are sliced off below (den's padded columns are discarded too)
    c_tile = 512 if channels >= 512 else _round_up(channels, 128)
    c_pad = _round_up(channels, c_tile)
    # the contraction dim of the logits matmul must stay lane-aligned
    h_pad = _round_up(bottleneck, 128)
    # batch rows per grid cell: biggest power-of-two divisor up to 8
    rows = 8
    while batch % rows:
        rows //= 2

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - channels)))
    hp = jnp.pad(hidden, ((0, 0), (0, 0), (0, h_pad - bottleneck))).astype(
        jnp.float32
    )
    w2p = jnp.pad(
        w2, ((0, h_pad - bottleneck), (0, c_pad - channels))
    ).astype(jnp.float32)
    b2p = jnp.pad(b2.astype(jnp.float32), (0, c_pad - channels))[None, :]
    wt = weights.astype(jnp.float32)

    grid = (batch // rows, c_pad // c_tile)
    out_shape = jax.ShapeDtypeStruct((batch, speakers, c_pad), jnp.float32)
    den, s1, s2 = pl.pallas_call(
        partial(_attn_stats_kernel, rows=rows),
        grid=grid,
        out_shape=(out_shape, out_shape, out_shape),
        in_specs=[
            pl.BlockSpec((rows, time, c_tile), lambda ib, ic: (ib, 0, ic)),
            # hidden / weights blocks depend only on the batch index, and
            # the channel axis iterates fastest, so Mosaic re-uses them
            # across the inner channel sweep instead of re-fetching
            pl.BlockSpec((rows, time, h_pad), lambda ib, ic: (ib, 0, 0)),
            pl.BlockSpec((h_pad, c_tile), lambda ib, ic: (0, ic)),
            pl.BlockSpec((1, c_tile), lambda ib, ic: (0, ic)),
            pl.BlockSpec((rows, speakers, time), lambda ib, ic: (ib, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rows, speakers, c_tile), lambda ib, ic: (ib, 0, ic)),
            pl.BlockSpec((rows, speakers, c_tile), lambda ib, ic: (ib, 0, ic)),
            pl.BlockSpec((rows, speakers, c_tile), lambda ib, ic: (ib, 0, ic)),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=int(6e7),
        ),
    )(xp, hp, w2p, b2p, wt)
    return den[..., :channels], s1[..., :channels], s2[..., :channels]
