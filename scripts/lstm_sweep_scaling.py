"""Is the LSTM sweep per-step-overhead-bound or matmul-bound?

The flagship step's largest cost is the 4-layer BiLSTM recurrence
(~0.61 ms/layer at B=256, PERF.md). A 4-layer WAVEFRONT kernel (layer
L+1 at time t-1 runs in the same step as layer L at time t) would merge
four sweeps into one with 4x the per-step matmul work — a win if and
only if per-step fixed overhead (VMEM loads, gate elementwise, control)
dominates the per-step matmul. Decisive measurement: scale the batch.
If sweep time grows ~linearly with B, the matmul dominates and a
wavefront buys nothing; if time is ~flat, overhead dominates and a
wavefront could reclaim most of 3 layers' overhead.

Also times the gate-stream projection both ways (full-sequence matmul vs
what a wavefront would serialize) for the complete picture.
"""

import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from diart_tpu.ops.pallas_lstm import lstm_sweep_tm  # noqa: E402


def bench(fn, proj_t, w_hh, iters=30):
    """Each iteration perturbs w_hh by a distinct tiny epsilon: the axon
    terminal caches results for identical (executable, inputs) pairs, so
    repeated identical calls measure the cache, not the chip."""
    outs = fn(proj_t, w_hh + 0.0)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for i in range(iters):
        outs = fn(proj_t, w_hh + (i + 1) * 1e-9)
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    T, H = 293, 128
    key = jax.random.PRNGKey(0)
    w_hh = jax.random.normal(key, (2, 4 * H, H), jnp.float32) * 0.2
    sweep = jax.jit(lstm_sweep_tm)
    for B in (64, 128, 256, 512, 1024):
        proj_t = (
            jax.random.normal(key, (T, 2, B, 4 * H), jnp.float32) * 0.3
        ).astype(jnp.bfloat16)
        ms = bench(sweep, proj_t, w_hh)
        per_step_us = ms * 1e3 / T
        flops = 2 * 2 * B * H * 4 * H * T  # both dirs, recurrent matmul only
        print(
            f"B={B:5d}: sweep={ms:7.3f} ms  {per_step_us:6.2f} us/step  "
            f"recurrent-matmul {flops / (ms * 1e-3) / 1e12:5.1f} TFLOP/s",
            flush=True,
        )

    # projection comparison at B=256: full-sequence (current, outside the
    # sweep) vs per-step serialized (what a wavefront forces for layers 1+)
    B, F = 256, 256
    x = (jax.random.normal(key, (T, B, F), jnp.float32) * 0.3).astype(jnp.bfloat16)
    w_ih = (jax.random.normal(key, (2, 4 * H, F), jnp.float32) * 0.1).astype(jnp.bfloat16)

    @jax.jit
    def full_seq(x, w):
        return jnp.einsum(
            "tbi,dgi->tdbg", x, w, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    @jax.jit
    def per_step(x, w):
        def body(carry, xt):
            y = jnp.einsum(
                "bi,dgi->dbg", xt, w, preferred_element_type=jnp.float32
            )
            return carry, y.astype(jnp.bfloat16)

        return jax.lax.scan(body, 0, x)[1]

    ms_full = bench(full_seq, x, w_ih)
    ms_step = bench(per_step, x, w_ih)
    print(
        f"projection B={B}: full-sequence={ms_full:.3f} ms  "
        f"per-step scan={ms_step:.3f} ms (wavefront pays the difference "
        f"x3 layers, minus the avoided stream round-trips)",
        flush=True,
    )


if __name__ == "__main__":
    main()
