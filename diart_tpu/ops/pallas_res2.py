"""Pallas TPU kernel: one fused ECAPA SE-Res2Block.

The ECAPA trunk's three SE-Res2Blocks are a long serial chain of small ops
(``models/ecapa.py:_SERes2Block``): a 1x1 TDNN, seven sequential 64-wide
dilated group convolutions with BN+ReLU between (each far below the MXU's
saturation shape and each bouncing its activation through HBM), a channel
concat, another 1x1 TDNN, a squeeze-excitation gate, and a residual add.
Left to XLA at batch 256 that region costs ~9 ms of the 25 ms engine step
(XProf, v5e): the group convs run at ~21 TFLOP/s, and the concat + residual
fusions are pure HBM traffic over (256, 501, 512) tensors.

This kernel runs the ENTIRE block for a (batch-rows, full-T, full-C) tile
in VMEM:

    z1   = bn1(relu(x @ w1 + b1))                      (1x1 TDNN, MXU)
    g_i  = chunk_i(z1); y_i = bn_i(relu(conv_d(g_i + y_{i-1})))
                                                       (7 dilated group convs,
                                                        shifted-slice matmuls)
    z2   = bn2(relu(cat(g_0, y_1..y_7) @ w2 + b2))     (1x1 TDNN, MXU)
    s    = sigmoid(relu(mean_T(z2) @ ws1 + bs1) @ ws2 + bs2)
    out  = x + z2 * s                                  (SE gate + residual)

so HBM sees the input activation once and the output once — no
intermediate ever leaves VMEM. Inference batch norms are pre-folded to
affines (``a = scale*rsqrt(var+eps)``, ``c = bias - mean*a``) exactly as
``models/common.py:InferenceBatchNorm`` applies them.

Reference behavior being fused: speechbrain ``SERes2NetBlock`` as executed
by the reference's ECAPA embeddings (``/root/reference/src/diart/
models.py:59``); parity with the unfused flax path is covered by
``tests/test_pallas_res2.py``.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_se_res2_block", "se_res2_block_reference"]


def _round_up(value: int, multiple: int) -> int:
    return (value + multiple - 1) // multiple * multiple


def _affine(y, a, c):
    return y * a + c


def se_res2_block_reference(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    a1: jnp.ndarray,
    c1: jnp.ndarray,
    wg: jnp.ndarray,
    bg: jnp.ndarray,
    ag: jnp.ndarray,
    cg: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    a2: jnp.ndarray,
    c2: jnp.ndarray,
    ws1: jnp.ndarray,
    bs1: jnp.ndarray,
    ws2: jnp.ndarray,
    bs2: jnp.ndarray,
    dilation: int,
):
    """Unfused jnp oracle of the kernel (parity tests, non-TPU backends and
    the backward pass). Matches ``models/ecapa.py:_SERes2Block`` with
    inference batch norms pre-folded into affines.

    x: (B, T, C). w1/w2: (C, C); b*/a*/c*: (C,). wg: (G, K, W, W) group conv
    stacks (G = scale-1 sequential groups, K taps, W = C // scale wide);
    bg/ag/cg: (G, W). ws1: (C, H), bs1: (H), ws2: (H, C), bs2: (C).
    Compute dtype follows x; BN affines and SE statistics apply in f32.
    """
    dt = x.dtype
    groups, taps, width, _ = wg.shape
    scale = groups + 1

    def tdnn(v, w, b, a, c):
        y = jnp.einsum("btc,cd->btd", v, w, preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b, 0.0)
        return _affine(y, a, c).astype(dt)

    z1 = tdnn(x, w1, b1, a1, c1)
    chunks = jnp.split(z1, scale, axis=-1)
    outputs = [chunks[0]]
    y = None
    pad = (taps - 1) * dilation // 2
    for i in range(groups):
        inp = chunks[i + 1] if y is None else chunks[i + 1] + y
        # speechbrain Conv1d pads 'same' with REFLECT mode (its default),
        # see models/common.py:reflect_pad_time
        padded = jnp.pad(inp, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        acc = jnp.zeros(inp.shape[:2] + (width,), jnp.float32)
        for j in range(taps):
            sl = padded[:, j * dilation : j * dilation + inp.shape[1]]
            acc = acc + jnp.einsum(
                "btw,wv->btv", sl, wg[i, j], preferred_element_type=jnp.float32
            )
        acc = jnp.maximum(acc + bg[i], 0.0)
        y = _affine(acc, ag[i], cg[i]).astype(dt)
        outputs.append(y)
    cat = jnp.concatenate(outputs, axis=-1)
    z2 = tdnn(cat, w2, b2, a2, c2)
    s = jnp.mean(z2.astype(jnp.float32), axis=1)  # (B, C)
    s = jnp.maximum(s @ ws1 + bs1, 0.0)
    gate = jax.nn.sigmoid(s @ ws2 + bs2)  # (B, C) f32
    return x + (z2 * gate[:, None, :].astype(dt)).astype(dt)


@lru_cache(maxsize=None)
def _with_vjp(dilation: int, interpret: bool):
    """Differentiable wrapper: Pallas forward, reference-formulation
    backward (pallas_call has no autodiff rule; training with the fast path
    on must still produce exact-formula gradients)."""

    @jax.custom_vjp
    def run(x, *params):
        return _run_kernel(x, params, dilation, interpret)

    def fwd(x, *params):
        return run(x, *params), (x, *params)

    def bwd(residuals, cotangent):
        _, vjp = jax.vjp(
            lambda *args: se_res2_block_reference(*args, dilation), *residuals
        )
        return vjp(cotangent)

    run.defvjp(fwd, bwd)
    return run


def _res2_kernel(
    x_ref,
    w1_ref,
    v1_ref,
    wg_ref,
    vg_ref,
    w2_ref,
    v2_ref,
    ws1_ref,
    vs1_ref,
    ws2_ref,
    vs2_ref,
    out_ref,
    *,
    rows: int,
    time: int,
    width: int,
    groups: int,
    taps: int,
    dilation: int,
):
    """One batch-rows cell, full T and C resident, one batch row per MXU
    pass (Mosaic rejects 2D<->3D vector shape casts at unaligned T, so
    everything stays 2D). Refs in VMEM: x (rows, T, C); w1/w2 (C, C);
    v1/v2 (3, C) = [bias; bn scale; bn shift]; wg (G*K*W, W) stacked group
    convs; vg (3*G, W) interleaved [b; a; c]; ws1 (C, H), vs1 (1, H),
    ws2 (H, C), vs2 (1, C); out (rows, T, C)."""
    dt = x_ref.dtype
    pad = (taps - 1) * dilation // 2
    dims = (((1,), (0,)), ((), ()))

    def tdnn(v, w_ref, aff_ref):
        y = jax.lax.dot_general(
            v, w_ref[...], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(y + aff_ref[0:1], 0.0)
        return (y * aff_ref[1:2] + aff_ref[2:3]).astype(dt)

    for r in range(rows):  # static unroll: independent passes per row
        x_r = x_ref[r]  # (T, C)
        z1 = tdnn(x_r, w1_ref, v1_ref)

        row = jax.lax.broadcasted_iota(jnp.int32, (time, width), 0)

        def shifted(v, s):
            # v[t + s] with REFLECT boundary handling (speechbrain Conv1d
            # pads 'same' in reflect mode): tpu rotate + iota mask for the
            # bulk (jnp.pad lowers to a sublane concat at unaligned offsets,
            # which Mosaic rejects), then one extra rotate + row-select per
            # boundary row (<= dilation rows per edge) to substitute the
            # mirrored sample v[-(t+s)] / v[2(time-1)-(t+s)] for the zeros.
            # Mosaic's dynamic_rotate only handles 32-bit lanes, so sub-f32
            # inputs (the bf16 trunk) roll as their exact f32 upcast and
            # cast back after the row selects.
            if s == 0:
                return v
            out_dt = v.dtype
            if jnp.dtype(out_dt).itemsize < 4:
                v = v.astype(jnp.float32)
            r = pltpu.roll(v, (-s) % time, 0)  # roll requires shift >= 0
            if s > 0:
                out = jnp.where(row < time - s, r, 0).astype(v.dtype)
                for k in range(s):  # rows time-s+k read v[time-2-k]
                    t, q = time - s + k, time - 2 - k
                    rk = pltpu.roll(v, (t - q) % time, 0)
                    out = jnp.where(row == t, rk, out).astype(v.dtype)
                return out.astype(out_dt)
            out = jnp.where(row >= -s, r, 0).astype(v.dtype)
            for k in range(-s):  # rows k read v[-s-k]
                q = (-s) - k
                rk = pltpu.roll(v, (k - q) % time, 0)
                out = jnp.where(row == k, rk, out).astype(v.dtype)
            return out.astype(out_dt)

        outputs = [z1[:, :width]]
        y = None
        for i in range(groups):
            inp = z1[:, (i + 1) * width : (i + 2) * width]
            if y is not None:
                inp = inp + y
            # dilated 'same' conv as ONE shifted-concat matmul on (T, K*W):
            # the K tap slices concatenate along lanes and contract against
            # the (K*W, W) stacked tap weights in a single MXU pass — K=3
            # taps of W=64 give a 192-deep contraction (75% of the 128-lane
            # MXU tile) where three separate W=64 dots ran at 50%.
            sl_cat = jnp.concatenate(
                [shifted(inp, (j * dilation) - pad) for j in range(taps)],
                axis=-1,
            )
            base = i * taps * width
            acc = jax.lax.dot_general(
                sl_cat, wg_ref[base : base + taps * width],
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            acc = jnp.maximum(acc + vg_ref[3 * i : 3 * i + 1], 0.0)
            y = (
                acc * vg_ref[3 * i + 1 : 3 * i + 2]
                + vg_ref[3 * i + 2 : 3 * i + 3]
            ).astype(dt)
            outputs.append(y)

        cat = jnp.concatenate(outputs, axis=-1)  # (T, C)
        z2 = tdnn(cat, w2_ref, v2_ref)

        # squeeze-excitation: mean over T, bottleneck MLP, sigmoid gate.
        # The MLP must NOT run as a (1, C) matmul: Mosaic compiles a
        # SINGLE-sublane f32 matmul through a reduced-precision path
        # (measured ~3e-2 abs error on O(4) values — bf16-level, while
        # n>=2 sublanes are bit-exact). Plain broadcast rows get
        # canonicalized back to the 1-sublane form, so the mean row is
        # placed in row 0 of an iota-masked (8, C) tile (rows 1..7 zero) —
        # distinct rows survive canonicalization, and the zero rows cost
        # nothing at this size.
        s = jnp.mean(z2.astype(jnp.float32), axis=0, keepdims=True)  # (1, C)
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, s.shape[1]), 0)
        s = jnp.where(rows8 == 0, jnp.broadcast_to(s, rows8.shape), 0.0)
        s = jax.lax.dot_general(
            s, ws1_ref[...], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        s = jnp.maximum(s + vs1_ref[...], 0.0)
        s = jax.lax.dot_general(
            s, ws2_ref[...], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        gate = jax.nn.sigmoid(s[0:1] + vs2_ref[...])  # (1, C)
        out_ref[r] = x_r + (z2 * gate.astype(dt)).astype(dt)


@partial(jax.jit, static_argnames=("dilation", "interpret"))
def fused_se_res2_block(
    x: jnp.ndarray,
    params: Tuple[jnp.ndarray, ...],
    dilation: int,
    interpret: bool = None,
):
    """One ECAPA SE-Res2Block without any HBM-resident intermediate.

    ``params`` is the 16-tuple ``(w1, b1, a1, c1, wg, bg, ag, cg, w2, b2,
    a2, c2, ws1, bs1, ws2, bs2)`` shaped as in
    :func:`se_res2_block_reference`.
    ``interpret=None`` resolves to compiled on TPU backends and interpreter
    mode elsewhere. Differentiable via the reference formulation.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _with_vjp(dilation, interpret)(x, *params)


def _run_kernel(x, params, dilation, interpret):
    (w1, b1, a1, c1, wg, bg, ag, cg, w2, b2, a2, c2, ws1, bs1, ws2, bs2) = params
    batch, time, chans = x.shape
    groups, taps, width, _ = wg.shape
    assert chans == (groups + 1) * width, (chans, groups, width)
    assert w1.shape == (chans, chans) and w2.shape == (chans, chans)
    hidden = ws1.shape[1]

    # batch rows per grid cell: biggest power-of-two divisor up to 8
    rows = 8
    while batch % rows:
        rows //= 2

    f32 = jnp.float32
    stack3 = lambda b, a, c: jnp.stack(
        [b.astype(f32), a.astype(f32), c.astype(f32)]
    )
    v1 = stack3(b1, a1, c1)  # (3, C)
    v2 = stack3(b2, a2, c2)
    # group affines interleaved (3*G, W): rows 3i, 3i+1, 3i+2 = b, a, c
    vg = jnp.stack([bg, ag, cg], axis=1).reshape(3 * groups, width).astype(f32)
    wgf = wg.astype(x.dtype).reshape(groups * taps * width, width)

    grid = (batch // rows,)
    spec_w = lambda shape: pl.BlockSpec(shape, lambda ib: tuple(0 for _ in shape))
    out = pl.pallas_call(
        partial(
            _res2_kernel,
            rows=rows,
            time=time,
            width=width,
            groups=groups,
            taps=taps,
            dilation=dilation,
        ),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((batch, time, chans), x.dtype),
        in_specs=[
            pl.BlockSpec((rows, time, chans), lambda ib: (ib, 0, 0)),
            spec_w((chans, chans)),
            spec_w((3, chans)),
            spec_w((groups * taps * width, width)),
            spec_w((3 * groups, width)),
            spec_w((chans, chans)),
            spec_w((3, chans)),
            spec_w((chans, hidden)),
            spec_w((1, hidden)),
            spec_w((hidden, chans)),
            spec_w((1, chans)),
        ],
        out_specs=pl.BlockSpec((rows, time, chans), lambda ib: (ib, 0, 0)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=int(1e8),
        ),
    )(
        x,
        w1.astype(x.dtype),
        v1,
        wgf,
        vg,
        w2.astype(x.dtype),
        v2,
        ws1.astype(f32),
        bs1.astype(f32)[None, :],
        ws2.astype(f32),
        bs2.astype(f32)[None, :],
    )
    return out
