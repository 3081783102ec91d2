"""Headline benchmark: concurrent real-time diarization streams per chip.

Runs the flagship fused multi-stream engine (full-size PyanNet segmentation +
XVectorSincNet embedding, 5 s windows sliding every 0.5 s — the reference's
default geometry, ``/root/reference/src/diart/blocks/diarization.py:21-86``)
and measures the steady-state wall time of one 0.5 s hop for a batch of
concurrent streams.

A stream is served in real time iff its share of the step time fits in the
0.5 s budget, so ``streams/chip = batch * 0.5 / t_step``.

Statistics (the dev TPU is time-shared through a tunnel; identical steps
have been observed at 6 ms and 600 ms minutes apart):

* headline = MEDIAN pipelined window time — the representative serving rate;
* best window is reported alongside as the capability figure;
* per-hop blocked latency is reported at p50 and p99 (the tail is what
  breaks the 500 ms real-time budget).

Usage: ``python bench.py [batch] [steps] [--mesh N]``. ``--mesh N`` shards
the same engine over N devices along a ``streams`` mesh axis (stream-level
data parallelism over ICI); with fewer real devices it provisions an
N-virtual-device CPU mesh, so the multi-chip path is exercised anywhere.

Baseline: the reference paper reports 50 ms per 0.5 s update on an NVIDIA
V100 (paper §5; BASELINE.md) == 10 real-time streams per GPU. vs_baseline is
the ratio against those 10 streams.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus
secondary stats on stderr).
"""

import argparse
import json
import sys
import time

import numpy as np


def _build_engine(
    batch: int, mesh_devices: int, dtype: str = "f32", emb_dtype: str = "bf16"
):
    from diart_tpu.models import EmbeddingModel, SegmentationModel
    from diart_tpu.parallel import MultiStreamEngine

    mesh = None
    if mesh_devices:
        from diart_tpu.parallel import streams_mesh

        mesh = streams_mesh(mesh_devices)

    # Flagship serving config: segmentation f32 (its sigmoid scores are the
    # DER-critical output), embedding trunk bf16 (it only feeds cosine
    # distances for clustering; half precision there is standard serving
    # practice and worth ~4% end-to-end). --dtype sets the segmentation
    # model, --emb-dtype the embedding trunk (pass both f32 for the fully
    # f32 configuration).
    seg = SegmentationModel.from_registry("tpu/pyannet", dtype=dtype)  # 4-spk PyanNet
    emb = EmbeddingModel.from_registry("tpu/xvector", dtype=emb_dtype)  # 512-d x-vector
    return MultiStreamEngine(
        segmentation=seg,
        embedding=emb,
        duration=5.0,
        step=0.5,
        latency=0.5,
        sample_rate=16000,
        max_speakers=20,
        batch_size=batch,
        mesh=mesh,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("batch", nargs="?", type=int, default=256)
    parser.add_argument("steps", nargs="?", type=int, default=20)
    parser.add_argument(
        "--mesh", type=int, default=0,
        help="shard streams over N devices (virtual CPU mesh if fewer exist)",
    )
    parser.add_argument(
        "--int16", action="store_true",
        help="ship int16 PCM blocks (half the host->device bytes per hop)",
    )
    parser.add_argument(
        "--dtype", default="f32", choices=("f32", "bf16"),
        help="segmentation-model compute dtype (f32 keeps the DER-critical "
        "scores at full precision)",
    )
    parser.add_argument(
        "--emb-dtype", default="bf16", choices=("f32", "bf16"),
        help="embedding-trunk compute dtype (bf16 default: embeddings only "
        "feed clustering distances)",
    )
    parser.add_argument(
        "--profile", metavar="DIR", default=None,
        help="write a TensorBoard/XProf device trace of the steady-state "
        "loop to DIR (open with xprof / tensorboard-plugin-profile)",
    )
    args = parser.parse_args()

    from pathlib import Path

    import jax

    batch, steps = args.batch, args.steps
    if args.mesh and batch % args.mesh:
        sys.exit(f"batch ({batch}) must be divisible by --mesh ({args.mesh})")
    engine = _build_engine(batch, args.mesh, args.dtype, args.emb_dtype)

    # Persistent compilation cache: the remote TPU compile service has high
    # latency variance (observed 1-30 min for the same program); cached
    # executables make reruns deterministic and fast. Enabled AFTER model
    # construction so the CPU-backend init programs never enter the cache —
    # CPU executables are AOT-compiled for the exact host CPU, and a foreign
    # entry fails to load (or worse) on other machines.
    cache_dir = Path(__file__).resolve().parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    rng = np.random.default_rng(0)
    state = engine.init_state()
    blocks_host = rng.normal(
        scale=0.1, size=(steps + 12, batch, engine.step_samples)
    ).astype(np.float32)
    if args.int16:
        blocks_host = np.clip(blocks_host * 32768.0, -32768, 32767).astype(np.int16)
    # Headline blocks are pre-staged on device: the headline measures the
    # CHIP's serving capability. (On production hardware the per-hop audio
    # transfer rides PCIe at GB/s — sub-ms for these payloads; this dev
    # environment reaches the TPU through a network tunnel whose transfers
    # are ~100x slower, so a transfer-inclusive number is reported
    # separately below rather than letting the tunnel set the headline.)
    blocks = [jax.device_put(b) for b in blocks_host]

    # warm up the audio ring + compile
    warmup = int(round(engine.duration / engine.step_duration))
    for i in range(warmup):
        run = np.full((batch,), i + 1 >= warmup)
        state, out = engine.step(state, blocks[i], run_mask=run)
    jax.block_until_ready(out.aggregated)

    if args.profile:
        # trace a short steady-state burst (compilation already done above)
        with jax.profiler.trace(args.profile):
            for i in range(5):
                state, out = engine.step(state, blocks[warmup + i % steps])
            jax.block_until_ready(out.aggregated)
        print(f"# xprof trace written to {args.profile}", file=sys.stderr)

    # Timed steady state: pipelined windows (block once per window, the way
    # a serving loop drains) for throughput; per-hop blocked steps for
    # latency percentiles. The window must be long enough to amortize the
    # one blocking sync at its end: in this dev environment that sync pays
    # the remote-TPU tunnel's ~28 ms round trip (XProf shows the device
    # chaining steps back-to-back with ~9 us gaps), which at window=10
    # inflated the per-step time by ~2.8 ms of pure measurement artifact.
    window = 25
    window_times = []
    blocked_times = []
    for w in range(max(5, steps // window)):
        t0 = time.perf_counter()
        for i in range(window):
            state, out = engine.step(state, blocks[warmup + (w * window + i) % steps])
        jax.block_until_ready(out.aggregated)
        window_times.append((time.perf_counter() - t0) / window)
        for _ in range(2):
            t0 = time.perf_counter()
            state, out = engine.step(state, blocks[w % steps])
            jax.block_until_ready(out.aggregated)
            blocked_times.append(time.perf_counter() - t0)

    t_median = float(np.median(window_times))
    t_best = float(np.min(window_times))
    p50 = float(np.percentile(blocked_times, 50))
    p99 = float(np.percentile(blocked_times, 99))
    streams = batch * engine.step_duration / t_median
    streams_best = batch * engine.step_duration / t_best

    # Secondary: transfer-inclusive hops (host-resident blocks each hop).
    xfer_times = []
    for i in range(10):
        t0 = time.perf_counter()
        state, out = engine.step(state, blocks_host[i % steps])
        jax.block_until_ready(out.aggregated)
        xfer_times.append(time.perf_counter() - t0)
    t_xfer = float(np.median(xfer_times))
    streams_xfer = batch * engine.step_duration / t_xfer
    print(
        json.dumps(
            {
                "metric": "realtime_streams_per_chip",
                "value": round(streams, 1),
                "unit": "streams",
                "vs_baseline": round(streams / 10.0, 2),
            }
        )
    )
    print(
        f"# batch={batch} mesh={args.mesh or 1} int16={args.int16} "
        f"dtype={args.dtype} emb_dtype={args.emb_dtype} "
        f"t_step_median={t_median*1000:.2f}ms t_step_best={t_best*1000:.2f}ms "
        f"streams_best={streams_best:.0f} "
        f"p50_chunk_latency={p50*1000:.2f}ms p99_chunk_latency={p99*1000:.2f}ms "
        f"transfer_inclusive={t_xfer*1000:.1f}ms/{streams_xfer:.0f}streams "
        f"(tunnel-bound in this dev env; PCIe-negligible in production) "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
