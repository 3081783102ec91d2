"""Compiled (Mosaic) parity of every default-on Pallas kernel at its exact
serving geometry, on the real chip.

Motivation: the fused SE-Res2 kernel passed interpret-mode parity
everywhere but FAILS compiled parity at the production geometry
(PERF.md "TPU-verified round 3") — interpret mode exercises the kernel
*semantics*, not the Mosaic lowering. The three default-on kernels
(`pallas_lstm`, `pallas_head`, `pallas_attn`) therefore need the same
certification the res2 episode showed was missing.

Two checks per kernel:

1. compiled-vs-oracle on device at the serving geometry (batch reduced
   where the unfused oracle would blow HBM — the oracle materializes the
   tensors the kernel exists to avoid);
2. row-split self-consistency at the FULL serving batch: batch elements
   are independent, so kernel(x)[i:j] must bit-match kernel(x[i:j]) —
   this catches batch-row/unroll-dependent miscompiles (exactly the res2
   failure mode) without needing the oracle at full size.

Run: ``python scripts/kernel_parity_tpu.py``. One line per check;
exit 1 if any bound is violated.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

FAILED = []


def report(name, err, bound):
    status = "ok" if err <= bound else "FAIL"
    if err > bound:
        FAILED.append(name)
    print(f"{name}: max_err={err:.3e} bound={bound:.0e} {status}", flush=True)


def _split_check(fn, args, batch_axes, full_batch, name, bound=0.0):
    """kernel(args)[lo:hi] vs kernel(args[lo:hi]) over uneven splits."""
    full = fn(*args)
    full = full if isinstance(full, tuple) else (full,)
    worst = 0.0
    for lo, hi in [(0, full_batch // 2), (full_batch // 2, full_batch),
                   (3, 11), (full_batch - 8, full_batch)]:
        part_args = [
            jax.lax.slice_in_dim(a, lo, hi, axis=ax) if ax is not None else a
            for a, ax in zip(args, batch_axes)
        ]
        part = fn(*part_args)
        part = part if isinstance(part, tuple) else (part,)
        for f, p in zip(full, part):
            f_slice = jax.lax.slice_in_dim(f, lo, hi, axis=0)
            worst = max(worst, float(jnp.max(jnp.abs(
                f_slice.astype(jnp.float32) - p.astype(jnp.float32)))))
    report(name, worst, bound)


def check_lstm():
    """PyanNet serving geometry: T=293 frames, H=128, layer-0 in=60,
    layer-1..3 in=256; both f32 (bit-exact vs scan) and bf16 stream."""
    from diart_tpu.ops.pallas_lstm import lstm_sweep_tm, _tm_reference

    key = jax.random.PRNGKey(0)
    T, B, H = 293, 256, 128
    # f32: bit-exact vs the scan by design (PERF.md bf16-LSTM row).
    # bf16: gate math is f32 either way, but the kernel STORES its hidden
    # states in the bf16 stream dtype while the scan oracle returns f32 —
    # the difference is one bf16 rounding of tanh-bounded outputs,
    # |err| <= 2^-8 (measured 5.9e-3).
    for dtype, bound in ((jnp.float32, 1e-5), (jnp.bfloat16, 2 ** -7)):
        k1, k2, key = jax.random.split(key, 3)
        proj_t = (jax.random.normal(k1, (T, 2, B, 4 * H), jnp.float32) * 0.5
                  ).astype(dtype)
        w_hh = jax.random.normal(k2, (2, 4 * H, H), jnp.float32) * 0.2
        got = lstm_sweep_tm(proj_t, w_hh)
        want = _tm_reference(proj_t, w_hh)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        report(f"lstm_sweep_tm/{jnp.dtype(dtype).name}", err, bound)
        _split_check(
            lambda p, w: jnp.moveaxis(lstm_sweep_tm(p, w), 2, 0),
            (proj_t, w_hh), (2, None), B,
            f"lstm_sweep_tm/{jnp.dtype(dtype).name}/rowsplit",
        )


def check_linear_stats():
    """x-vector fused head: (B, 279, 512) -> 1500 channels, S=4 speakers."""
    from diart_tpu.ops.pallas_stats import (
        fused_linear_stats,
        linear_stats_reference,
    )

    key = jax.random.PRNGKey(1)
    B, T, Cin, C, S = 64, 279, 512, 1500, 4
    k1, k2, k3, k4, key = jax.random.split(key, 5)
    x = (jax.random.normal(k1, (B, T, Cin), jnp.float32)).astype(jnp.bfloat16)
    w = jax.random.normal(k2, (Cin, C), jnp.float32) * 0.05
    b = jax.random.normal(k3, (C,), jnp.float32) * 0.1
    scale = 1.0 + 0.1 * jax.random.normal(k4, (C,), jnp.float32)
    shift = 0.1 * jax.random.normal(k1, (C,), jnp.float32)
    weights = jax.nn.softmax(jax.random.normal(k2, (B, S, T), jnp.float32))
    got = fused_linear_stats(x, w, b, scale, shift, weights)
    want = linear_stats_reference(x, w, b, scale, shift, weights)
    err = max(
        float(jnp.max(jnp.abs(g - r))) / max(1.0, float(jnp.max(jnp.abs(r))))
        for g, r in zip(got, want)
    )
    # f32 accumulation both sides, different reduction order over the
    # 512-deep contraction + 279-frame sum of bf16 inputs (measured 2.1e-4)
    report("fused_linear_stats/oracle", err, 1e-3)

    B_full = 256
    xf = jnp.tile(x, (4, 1, 1))
    wf_ = jnp.tile(weights, (4, 1, 1))
    _split_check(
        lambda xx, ww: fused_linear_stats(x=xx, w=w, b=b, scale=scale,
                                          shift=shift, weights=ww),
        (xf, wf_), (0, 0), B_full, "fused_linear_stats/rowsplit",
    )


def check_attn_stats():
    """ECAPA / TitaNet fused attentive pooling at serving channel widths."""
    from diart_tpu.ops.pallas_attn_stats import (
        fused_attentive_stats,
        attentive_stats_reference,
    )

    key = jax.random.PRNGKey(2)
    for family, C in (("ecapa", 1536), ("titanet", 3072)):
        B, T, H, S = 32, 501, 128, 4
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        x = jax.random.normal(k1, (B, T, C), jnp.float32).astype(jnp.bfloat16)
        hidden = jnp.tanh(jax.random.normal(k2, (B, T, H), jnp.float32))
        w2 = jax.random.normal(k3, (H, C), jnp.float32) * 0.1
        b2 = jax.random.normal(k4, (C,), jnp.float32) * 0.1
        weights = jax.nn.softmax(jax.random.normal(k1, (B, S, T), jnp.float32))
        got = fused_attentive_stats(x, hidden, w2, b2, weights)
        want = attentive_stats_reference(x, hidden, w2, b2, weights)
        err = max(
            float(jnp.max(jnp.abs(g - r)))
            / max(1.0, float(jnp.max(jnp.abs(r))))
            for g, r in zip(got, want)
        )
        report(f"fused_attentive_stats/{family}/oracle", err, 1e-4)

        B_full = 128 if C == 3072 else 256
        reps = B_full // B
        xf = jnp.tile(x, (reps, 1, 1))
        hf = jnp.tile(hidden, (reps, 1, 1))
        wf_ = jnp.tile(weights, (reps, 1, 1))
        _split_check(
            lambda xx, hh, ww: fused_attentive_stats(xx, hh, w2, b2, ww),
            (xf, hf, wf_), (0, 0, 0), B_full,
            f"fused_attentive_stats/{family}/rowsplit",
        )


def main():
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    check_lstm()
    check_linear_stats()
    check_attn_stats()
    if FAILED:
        print(f"parity=FAIL {FAILED}", flush=True)
        sys.exit(1)
    print("parity=ok", flush=True)


if __name__ == "__main__":
    main()
