"""Isolate the conv_ring pathology (bench A/B: flagship 12.9 -> 152 ms).

Times each piece of the incremental-frontend path at the production flagship
geometry (B=256, C=80, fpb=800, nb=10 -> ring (256, 8800, 80) bf16) on the
real chip, plus the candidate XLA reformulations:

  - kernel:       current Pallas rotated_pooled (grid = one cell per stream,
                  full-row dynamic roll per cell)
  - onehot_read:  rotation as a one-hot slot-permutation matmul (gather-as-
                  matmul, same trick as ops/assignment.py) + affine/abs/pool
  - scatter_write: vmapped per-stream dynamic_update_slice block write
  - onehot_write: the same write as a full-ring select
  - block_conv:   the incremental per-block conv (the work conv_ring keeps)
  - direct_conv:  the full-window conv+abs+pool being replaced (context)

Every iteration perturbs an input (the axon terminal caches identical
(executable, inputs) runs) and chains on the previous output.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B, C, FPB, NB = int(os.environ.get("PROBE_B", 256)), 80, 800, 10
W = NB * FPB  # 8000 window frames
TRIM = 25
POOLED = (W - TRIM) // 3  # 2658
KERNEL = 251
STRIDE = 10
RING_FRAMES = (NB + 1) * FPB  # trailing trash slot rides along


def timed(name, f, args, iters=20, rounds=3):
    """Median of `rounds` chained-iteration timings; f returns a pytree whose
    first leaf replaces args[0] (state threading) and is perturbed."""
    def sync(x):
        # block_until_ready alone does not wait through the axon tunnel;
        # a D2H fetch of one element forces real completion (the idiom of
        # every on-chip microbench in scripts/)
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x.ravel()[:1]))

    args = list(args)
    out = f(*args)
    first = out[0] if isinstance(out, tuple) else out
    sync(first)
    if first.shape == args[0].shape and first.dtype == args[0].dtype:
        args[0] = first
    best = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for i in range(iters):
            args[-1] = args[-1] + 1e-6  # perturb the scalar knob
            out = f(*args)
            first = out[0] if isinstance(out, tuple) else out
            if first.shape == args[0].shape and first.dtype == args[0].dtype:
                args[0] = first
        sync(first)
        best.append((time.perf_counter() - t0) / iters)
    print(f"{name:>14s}: {min(best)*1e3:8.3f} ms", flush=True)
    return min(best)


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    ring = jnp.asarray(
        rng.normal(size=(B, RING_FRAMES, C)) * 0.1, jnp.bfloat16
    )
    shift = jnp.asarray(rng.integers(0, W, (B,)) // FPB * FPB, jnp.int32)
    sigma = (W - shift) // FPB % NB  # chronological start slot
    a = jnp.ones((B,), jnp.float32)
    c = jnp.zeros((B,), jnp.float32)
    tapsum = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    knob = jnp.float32(0.0)

    # ---- the (since-removed) Pallas rotate kernel --------------------- #
    # ops/pallas_convring.py measured 16.7 ms here and was deleted; check
    # out commit 480555a to re-measure it. The import degrades gracefully.
    try:
        from diart_tpu.ops.pallas_convring import rotated_pooled

        @jax.jit
        def k_kernel(ring, shift, a, c, tapsum, knob):
            return rotated_pooled(
                ring,
                shift,
                a + knob,
                c,
                tapsum,
                window_frames=W,
                trim=TRIM,
                pooled_frames=POOLED,
            )
    except ImportError:
        k_kernel = None

    # ---- one-hot slot-permutation read ------------------------------- #
    @jax.jit
    def k_onehot_read(ring, sigma, a, c, tapsum, knob):
        slots = ring.reshape(B, NB + 1, FPB, C)
        j = jnp.arange(NB)[None, :]  # chronological position
        perm = jnp.mod(sigma[:, None] + j, NB)  # source slot per position
        onehot = jax.nn.one_hot(perm, NB + 1, dtype=ring.dtype)  # (B,NB,NB+1)
        chron = jax.lax.dot_general(
            onehot,
            slots.reshape(B, NB + 1, FPB * C),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(B, W, C)
        z = chron[:, TRIM : TRIM + 3 * POOLED]
        z = jnp.abs((a + knob)[:, None, None] * z + (c[:, None] * tapsum)[:, None, :])
        return jnp.max(z.reshape(B, POOLED, 3, C), axis=2)

    # ---- writes ------------------------------------------------------ #
    y = jnp.asarray(rng.normal(size=(B, FPB, C)) * 0.1, jnp.bfloat16)
    slot = jnp.asarray(rng.integers(0, NB, (B,)), jnp.int32)

    @partial(jax.jit, donate_argnums=(0,))
    def k_scatter_write(ring, y, slot, knob):
        return jax.vmap(
            lambda rr, blk, s: jax.lax.dynamic_update_slice(
                rr, blk, (s * FPB, 0)
            )
        )(ring, y + knob.astype(ring.dtype), slot)

    @partial(jax.jit, donate_argnums=(0,))
    def k_onehot_write(ring, y, slot, knob):
        slots = ring.reshape(B, NB + 1, FPB, C)
        sel = jax.nn.one_hot(slot, NB + 1, dtype=bool)  # (B, NB+1)
        out = jnp.where(
            sel[:, :, None, None], (y + knob.astype(ring.dtype))[:, None], slots
        )
        return out.reshape(B, RING_FRAMES, C)

    # ---- convs -------------------------------------------------------- #
    filters = jnp.asarray(rng.normal(size=(C, KERNEL)) * 0.05, jnp.float32)
    block = jnp.asarray(rng.normal(size=(B, 8000 + TRIM * STRIDE)), jnp.float32)
    window = jnp.asarray(rng.normal(size=(B, 80000)), jnp.float32)

    @jax.jit
    def k_block_conv(block, filters, knob):
        return jax.lax.conv_general_dilated(
            (block + knob)[:, None, :],
            filters[:, None, :],
            window_strides=(STRIDE,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NHC"),
        ).astype(jnp.bfloat16)

    @jax.jit
    def k_direct_conv(window, filters, knob):
        yy = jax.lax.conv_general_dilated(
            (window + knob)[:, None, :],
            filters[:, None, :],
            window_strides=(STRIDE,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NHC"),
        )
        z = jnp.abs(yy[:, : 3 * POOLED])
        return jnp.max(z.reshape(B, POOLED, 3, C), axis=2)

    # ---- chronological shift-ring (candidate reformulation) ----------- #
    # ring stays in time order; advance = static slice+concat, pause-masked
    # by a full select; read = free static slice feeding affine/abs/pool.
    ring_w = jnp.asarray(rng.normal(size=(B, W, C)) * 0.1, jnp.bfloat16)
    mask = jnp.asarray(rng.integers(0, 2, (B,)).astype(bool))

    @partial(jax.jit, donate_argnums=(0,))
    def k_shift_write(ring, y, mask, knob):
        new = jnp.concatenate([ring[:, FPB:], y + knob.astype(ring.dtype)], 1)
        return jnp.where(mask[:, None, None], new, ring)

    @jax.jit
    def k_shifted_read(ring, a, c, tapsum, knob):
        z = ring[:, TRIM : TRIM + 3 * POOLED].astype(jnp.float32)
        z = jnp.abs((a + knob)[:, None, None] * z + (c[:, None] * tapsum)[:, None, :])
        return jnp.max(z.reshape(B, POOLED, 3, C), axis=2)

    @jax.jit
    def k_noop(x, knob):
        return x + knob

    timed("noop", k_noop, [jnp.zeros((8, 128), jnp.float32), knob])
    timed("block_conv", k_block_conv, [block, filters, knob])
    timed("direct_conv", k_direct_conv, [window, filters, knob])
    timed("shift_write", k_shift_write, [ring_w + 0, y, mask, knob])
    timed("shifted_read", k_shifted_read, [ring_w, a, c, tapsum, knob])
    timed("onehot_read", k_onehot_read, [ring, sigma, a, c, tapsum, knob])
    timed("scatter_write", k_scatter_write, [ring + 0, y, slot, knob])
    timed("onehot_write", k_onehot_write, [ring + 0, y, slot, knob])
    if k_kernel is not None:
        timed("kernel", k_kernel, [ring, shift, a, c, tapsum, knob])


if __name__ == "__main__":
    main()
