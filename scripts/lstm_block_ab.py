"""On-chip A/B: per-timestep vs DMA-blocked LSTM sweep kernel.

The sweep is latency-bound (PERF.md: ~2.1 us/step measured against
~0.34 us of recurrent matmul), and the per-timestep kernel pays 4 DMA
start/waits per step. The blocked kernel moves `block` timesteps per
double-buffered DMA pair. This script measures both at the production
geometry (T=293, H=128, bf16 stream) plus compiled parity.

Run on the TPU: python scripts/lstm_block_ab.py [batch]
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from diart_tpu.ops.pallas_lstm import lstm_sweep_tm  # noqa: E402


def _sync(x):
    """True synchronization: fetch 4 bytes of the RESULT (data dependency).
    In this dev environment the remote runtime's block_until_ready has been
    observed to return before the device finished (bench.py `_sync`) — the
    round-4 run of this script printed a 0.117 ms/layer bf16 "per-step"
    figure, i.e. pure-matmul speed with zero per-step overhead, which is
    the unsynchronized dispatch time, not the kernel."""
    jax.block_until_ready(x)
    import numpy as np

    np.asarray(jax.device_get(x.ravel()[:1]))


def bench(fn, proj_t, w_hh, iters=50):
    """Perturb w_hh per iteration: the axon terminal caches results for
    identical (executable, inputs) pairs (PERF.md 'How to measure').
    The epsilon must survive a bf16 round-trip (the sweep casts w_hh to
    the stream dtype): 1e-9 rounds away in bf16 and the whole loop then
    measures the cache — observed 0.042 "ms/layer"."""
    outs = fn(proj_t, w_hh + 0.0)
    _sync(outs)
    t0 = time.perf_counter()
    for i in range(iters):
        outs = fn(proj_t, w_hh + (i + 1) * 1e-3)
    _sync(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"# backend={jax.default_backend()} B={B}", file=sys.stderr)
    T, H = 293, 128
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    w_hh = jax.random.normal(k1, (2, 4 * H, H), jnp.float32) * 0.2

    for dt in (jnp.bfloat16, jnp.float32):
        proj_t = (jax.random.normal(k2, (T, 2, B, 4 * H), jnp.float32) * 0.3).astype(dt)
        base = lstm_sweep_tm(proj_t, w_hh, block=0)
        base_ms = bench(lambda p, w: lstm_sweep_tm(p, w, block=0), proj_t, w_hh)
        print(f"{dt.__name__}: per-step kernel {base_ms:7.3f} ms/layer", flush=True)
        for block in (4, 8, 16):
            got = lstm_sweep_tm(proj_t, w_hh, block=block)
            err = float(
                jnp.max(jnp.abs(got.astype(jnp.float32) - base.astype(jnp.float32)))
            )
            ms = bench(
                lambda p, w, blk=block: lstm_sweep_tm(p, w, block=blk), proj_t, w_hh
            )
            print(
                f"{dt.__name__}: block={block:2d} {ms:7.3f} ms/layer  "
                f"({ms / base_ms * 100:5.1f}% of per-step)  maxerr={err:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
