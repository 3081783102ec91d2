"""Multi-layer bidirectional LSTM tuned for TPU execution.

The reference's segmentation model (pyannote PyanNet) runs a 4-layer
bidirectional LSTM over ~293 frames. A scan over time is inherently
sequential, so the implementation splits the work so the MXU sees large
matmuls and the scan body stays minimal:

* the input projection ``x @ W_ih^T + b`` for the *whole sequence* is one
  batched matmul outside the scan ((B*T, in) x (in, 4H));
* both directions run in a single ``lax.scan`` whose body does one batched
  matmul ``(2, B, H) x (2, H, 4H)`` — for multi-stream serving B is the
  number of concurrent streams, keeping the MXU fed;
* the backward direction is realized by flipping the input sequence, so the
  shared scan always walks forward in memory.

Gate order is PyTorch's (i, f, g, o) so converted checkpoints drop in
without reshuffling.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["BiLSTM"]


def _use_pallas_default() -> bool:
    """The Pallas sweep kernel (ops/pallas_lstm.py) is ON by default on TPU
    backends — it is bit-parity tested against the scan path and measures
    ~3-4% faster end-to-end on the full diarization engine (v5e, batch
    128-256). Resolved through the precision policy
    (:mod:`diart_tpu.precision`; env override ``DIART_TPU_PALLAS_LSTM=0``).
    Compiled Pallas requires a TPU backend, so it is never used on CPU
    (hermetic tests, CPU-backend param initialization)."""
    from .. import precision

    return precision.enabled("pallas_lstm")


def _bidirectional_scan(proj: jnp.ndarray, w_hh: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """Run forward+backward LSTM in one scan.

    proj: (2, batch, time, 4*hidden) pre-projected inputs (dir 1 already
        time-flipped); w_hh: (2, 4*hidden, hidden).

    Returns (2, batch, time, hidden) — dir 1 still time-flipped.
    """
    _, batch, _, _ = proj.shape
    h0 = jnp.zeros((2, batch, hidden), dtype=proj.dtype)
    c0 = jnp.zeros((2, batch, hidden), dtype=proj.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.einsum(
            "dbh,dgh->dbg", h, w_hh, preferred_element_type=jnp.float32
        ).astype(xt.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    xs = jnp.moveaxis(proj, 2, 0)  # (time, 2, batch, 4H)
    _, ys = jax.lax.scan(step, (h0, c0), xs)
    return jnp.moveaxis(ys, 0, 2)  # (2, batch, time, hidden)


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM; returns the full output sequence.

    keep_time_major: return (time, batch, 2*hidden) instead of
    (batch, time, 2*hidden). The pallas fast path runs the whole stack
    time-major, and per-frame consumers (Dense layers) are layout-agnostic —
    transposing the wide hidden sequence back costs ~0.25 ms/step at batch
    256 where transposing the per-frame classifier OUTPUT is free.
    """

    hidden_size: int = 128
    num_layers: int = 4
    use_pallas: bool = None
    keep_time_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (batch, time, features) -> (batch, time, 2*hidden)"""
        use_pallas = (
            _use_pallas_default() if self.use_pallas is None else self.use_pallas
        )
        # The sweep kernel slices each H-wide gate out of the 4H stream in
        # the lane dimension, and Mosaic requires lane slices to be aligned
        # to the 128-lane tile: non-multiple-of-128 hidden sizes (custom
        # small models; the production PyanNet uses 128) fall back to the
        # XLA scan instead of failing to compile.
        if self.hidden_size % 128:
            use_pallas = False
        # The sweep is HBM-bound: the pre-projected gate stream is ~300 MB
        # per layer at batch 256 (written by the projection matmul, re-read
        # by the recurrence). Streaming it in bf16 halves that traffic and
        # lets both matmuls run at the MXU's bf16 rate, while the kernel
        # keeps gate math and the cell state in f32. TPU-only, opt out with
        # DIART_TPU_BF16_LSTM=0 (or Precision(bf16_lstm=False)).
        from .. import precision

        stream_dtype = (
            jnp.bfloat16
            if use_pallas and precision.enabled("bf16_lstm")
            else x.dtype
        )
        h = self.hidden_size
        if use_pallas:
            # Time-major, unreversed layout for the whole stack: the sweep
            # kernel walks direction 1 backwards by INDEXING (flip_dir1), so
            # no time-flipped copy of the 150 MB/layer gate stream — and no
            # post-sweep reverse of the hidden states — is ever
            # materialized. Measured ~0.9 ms/step of pure layout traffic at
            # batch 256 before this.
            from ..ops.pallas_lstm import lstm_sweep_tm

            x = jnp.moveaxis(x, 1, 0)  # (T, B, F)
        for layer in range(self.num_layers):
            in_dim = x.shape[-1]
            w_ih = self.param(
                f"l{layer}_w_ih",
                # the weight is applied as x @ W^T, so fan-in is the LAST
                # axis (in_dim) — lecun_normal's default in_axis=-2 would
                # take 4h as fan-in and mis-scale from-scratch init by
                # sqrt(in_dim/4h) (converted checkpoints are unaffected)
                nn.initializers.lecun_normal(in_axis=-1, out_axis=-2),
                (2, 4 * h, in_dim),  # [forward, backward]
            )
            w_hh = self.param(
                f"l{layer}_w_hh", nn.initializers.orthogonal(), (2, 4 * h, h)
            )
            b = self.param(f"l{layer}_b", nn.initializers.zeros, (2, 4 * h))

            if use_pallas:
                proj_t = (
                    jnp.einsum(
                        "tbi,dgi->tdbg",
                        x.astype(stream_dtype),
                        w_ih.astype(stream_dtype),
                        preferred_element_type=jnp.float32,
                    )
                    + b[None, :, None, :]
                ).astype(stream_dtype)
                # DMA-blocked sweep (K timesteps per double-buffered DMA
                # pair instead of 4 DMA start/waits per step); bit-exact
                # vs the per-step kernel, so engaging it is a pure
                # scheduling change.
                block = (
                    int(os.environ.get("DIART_TPU_LSTM_BLOCK_K", "8"))
                    if precision.enabled("lstm_block")
                    else 0
                )
                out_t = lstm_sweep_tm(proj_t, w_hh, block=block)  # (T, 2, B, H)
                x = jnp.concatenate([out_t[:, 0], out_t[:, 1]], axis=-1)
            else:
                # (2, B, T, in): dir 0 forward, dir 1 time-flipped
                both = jnp.stack([x, x[:, ::-1, :]], axis=0).astype(stream_dtype)
                proj = (
                    jnp.einsum(
                        "dbti,dgi->dbtg",
                        both,
                        w_ih.astype(stream_dtype),
                        preferred_element_type=jnp.float32,
                    )
                    + b[:, None, None, :]
                ).astype(stream_dtype)
                out = _bidirectional_scan(proj, w_hh, h)
                x = jnp.concatenate([out[0], out[1][:, ::-1, :]], axis=-1)
        if use_pallas and not self.keep_time_major:
            x = jnp.moveaxis(x, 0, 1)  # back to (B, T, 2H)
        elif not use_pallas and self.keep_time_major:
            x = jnp.moveaxis(x, 1, 0)  # (T, B, 2H)
        return x
