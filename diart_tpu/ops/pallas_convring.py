"""Pallas TPU kernel: rotated read of the incremental sinc-conv ring.

The multi-stream engine's ``conv_ring`` fast path exploits the linearity of
the SincNet stage-1 convolution: the waveform instance-norm is an affine
map with per-stream scalars (``a = scale * rsqrt(var + eps)``,
``c = bias - mean * a``), so

    conv(a * x + c) == a * conv(x) + c * sum_taps(filters)

and the convolution of the 4.5 s of UNCHANGED samples can live in a device
ring across hops — each step convolves only the incoming 0.5 s block
(~1/10 of the window) and the full-window work collapses to this kernel:
one rotated read of the ring fused with the affine, the |.| nonlinearity,
and the non-overlapping max-pool(3). HBM sees the ring once (bf16) and the
pooled output once; the rotation itself is a VMEM register rotate
(``tpu.dynamic_rotate``), not a gather or a materialized roll.

Layout notes (all Mosaic-dictated, measured on v5e):
- The ring is TIME-MAJOR ``(B, frames, C)``: the rotation then runs along
  sublanes, and the pool's ``(3P, C) -> (P, 3, C)`` reshape splits the
  MAJOR dimension, which is layout-preserving — the minor-dim variant
  ``(C, 3P) -> (C, P, 3)`` is an unsupported shape cast. The pooled output
  lands directly in the ``(B, T, C)`` layout the following SincNet conv
  consumes, removing that transpose too.
- ``tpu.dynamic_rotate`` is 32-bit-only, so a bf16 ring upcasts in VMEM
  before rotating (a VPU convert; HBM traffic is unchanged).
- Blocks must span the full ring row (the trailing masked-write trash slot
  rides along in the DMA) because a non-full last block dim must be
  128-divisible.

Each stream owns its rotation (streams pause/resume independently —
``MultiStreamEngine.step``'s ``audio_mask`` contract), so the grid is one
cell per stream and the per-stream shift arrives as a scalar-prefetch
operand.

Reference behavior being replaced: the full-window ``SincConv`` + abs +
maxpool of ``models/sincnet.py:SincNet`` (itself mirroring pyannote's
SincNet, loaded by ``/root/reference/src/diart/models.py:42-59``); the
engine-level parity is pinned by ``tests/test_conv_ring.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rotated_pooled", "rotated_pooled_reference"]


def rotated_pooled_reference(
    ring: jnp.ndarray,
    shift: jnp.ndarray,
    a: jnp.ndarray,
    c: jnp.ndarray,
    tapsum: jnp.ndarray,
    *,
    window_frames: int,
    trim: int,
    pooled_frames: int,
) -> jnp.ndarray:
    """Portable XLA formulation (CPU path and the kernel's parity oracle).

    ring: (B, >= window_frames, C) circular TIME-MAJOR conv-output ring
        (any extra trailing frames — the masked-write trash slot — are
        ignored);
    shift: (B,) int32 rotation making the ring chronological, i.e.
        ``chron[t] = ring[(t - shift) % W]`` with ``shift = (W - off) % W``
        for a chronological start offset ``off``;
    a, c: (B,) per-stream waveform-norm affine;
    tapsum: (C,) per-channel filter tap sums.
    Returns (B, pooled_frames, C) f32: ``maxpool3(|a * chron + c*tapsum|)``
    over chronological frames [trim, trim + 3*pooled_frames).
    """
    y = ring[:, :window_frames]
    chron = jax.vmap(lambda row, s: jnp.roll(row, s, axis=0))(y, shift)
    z = chron[:, trim : trim + 3 * pooled_frames].astype(jnp.float32)
    z = jnp.abs(a[:, None, None] * z + (c[:, None] * tapsum[None, :])[:, None, :])
    b_dim, ch = z.shape[0], z.shape[2]
    return jnp.max(z.reshape(b_dim, pooled_frames, 3, ch), axis=2)


def _kernel(
    shift_ref,  # (B,) int32, scalar prefetch (SMEM)
    a_ref,  # (B,) f32, scalar prefetch
    c_ref,  # (B,) f32, scalar prefetch
    ring_ref,  # (1, W + trash, C) block (one stream's full ring row)
    ts_ref,  # (1, C) f32 tap sums (broadcast to every cell)
    out_ref,  # (1, P, C) f32
    *,
    window: int,
    trim: int,
    pooled: int,
):
    i = pl.program_id(0)
    y = ring_ref[0][:window]  # (W, C)
    # chron[t] = y[(t + off) % W]  ==  jnp.roll(y, W - off)[t]; the rotate
    # is 32-bit-only, so a bf16 ring upcasts first.
    y = pltpu.roll(y.astype(jnp.float32), shift_ref[i], axis=0)
    z = y[trim : trim + 3 * pooled]
    z = jnp.abs(a_ref[i] * z + c_ref[i] * ts_ref[0][None, :])
    ch = z.shape[1]
    out_ref[0] = jnp.max(z.reshape(pooled, 3, ch), axis=1)


def rotated_pooled(
    ring: jnp.ndarray,
    shift: jnp.ndarray,
    a: jnp.ndarray,
    c: jnp.ndarray,
    tapsum: jnp.ndarray,
    *,
    window_frames: int,
    trim: int,
    pooled_frames: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused rotate + waveform-norm affine + |.| + maxpool(3) over the ring.

    See :func:`rotated_pooled_reference` for the argument contract. On
    non-TPU backends the portable formulation runs instead (the kernel's
    Mosaic lowering is TPU-only); ``interpret=True`` forces the Pallas
    interpreter (kernel-logic tests on CPU).
    """
    if not interpret and jax.default_backend() != "tpu":
        return rotated_pooled_reference(
            ring,
            shift,
            a,
            c,
            tapsum,
            window_frames=window_frames,
            trim=trim,
            pooled_frames=pooled_frames,
        )
    b_dim, ch = ring.shape[0], ring.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b_dim,),
        in_specs=[
            pl.BlockSpec(
                (1, ring.shape[1], ch), lambda i, *_: (i, 0, 0)
            ),
            pl.BlockSpec((1, ch), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, pooled_frames, ch), lambda i, *_: (i, 0, 0)
        ),
    )
    return pl.pallas_call(
        partial(
            _kernel, window=window_frames, trim=trim, pooled=pooled_frames
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # the rotate + pool of a full (W, C) f32 row plus double
            # buffering exceeds the 16 MB default scoped-vmem budget at the
            # production geometry; v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((b_dim, pooled_frames, ch), jnp.float32),
        interpret=interpret,
    )(
        shift.astype(jnp.int32),
        a.astype(jnp.float32),
        c.astype(jnp.float32),
        ring,
        tapsum.astype(jnp.float32)[None, :],
    )
