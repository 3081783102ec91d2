"""On-chip cohort-serving benchmark: can ONE chip actually SERVE
``cohorts * batch`` concurrent real-time streams?

Round-4 left a gap between the throughput headline (a 256-stream hop costs
~13 ms of every 500 ms step period, so the chip is ~97% idle) and the
serving stack (one server = one session = one 256-slot table). This bench
drives the closing design: K :class:`MultiStreamSession` cohorts sharing
ONE compiled engine (params + executables per-engine; per-cohort device
state only), ticked at staggered phases ``j * step / K`` within the step
period — the schedule ``StreamingServer(cohorts=K)`` runs in realtime mode.

Methodology (serve_bench's, at the session level): the 1-core dev host
cannot feed thousands of websockets, and the device-side claim is what
needs proving, so hops are driven in-process through the full serving path
(``session.push_rttm``: host->device block transfer, device step, fused
fetch, batched RTTM assembly). Real time is enforced by wall clock: each
cohort's hop is DUE at its phase; we record start lateness (due vs actual
dispatch) and reply latency (due -> RTTM text ready). A config is
SUSTAINED when lateness does not grow over the run (no backlog) and reply
p99 stays within one step period.

Two schedules:

* ``sync``: each hop blocks to completion before the next cohort's hop —
  the realtime server's default path. On production PCIe a blocked hop is
  ~15 ms (13 ms device + PCIe transfers) so ~30 cohorts fit; through this
  dev environment's network tunnel a blocked hop pays ~50 ms of RTT
  plumbing plus ~200 ms shipping the 8 MB block batch (measured 247 ms),
  which bounds the SYNC schedule at K=2 here (and only here — the same
  tunnel artifact bench.py documents for ``transfer_inclusive``).
* ``pipelined``: dispatch cohort j's hop (``push_begin``, ~1 ms — JAX
  transfers and steps asynchronously) on the scheduler thread and harvest
  it (``push_finish_rttm``) on cohort j's own single-thread executor —
  safe ACROSS cohorts because sessions share no host state (unlike the
  measured-losing in-session pipelining, PERF.md round-4; the per-cohort
  executors keep each session's harvests in dispatch order). Tunnel RTTs
  of different cohorts overlap each other and the device's back-to-back
  steps, so the sustained bound returns to device time + host assembly.

Transfer realism: by default blocks are HOST arrays per hop (the full
serving ingest path, tunnel-taxed here). ``--staged`` pre-stages the
audio pool on device — the production-PCIe proxy for the device-side
claim, same rationale as bench.py's headline (PCIe ships 8 MB in ~2 ms;
the tunnel is a dev-environment artifact).

Churn leg: ``--churn N`` resets N lanes of cohort 0 a third of the way in
(the compiled churn-batch reset + their re-warm-up hops run inside the
schedule) to show admission storms don't break the real-time schedule.

Usage: ``python scripts/cohort_bench.py [--batch 256] [--cohorts 4,8]
[--periods 40] [--mode sync,pipelined] [--staged] [--churn 32] [--int16]
[--no-bits] [--vad]`` — ``--no-bits`` A/Bs the device-binarized packed
fetch off; ``--vad`` serves the segmentation-only pipeline (~6.7 ms
device hop, ~2x the flagship's cohort ceiling).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def _build_engine(batch, vad=False):
    """Flagship serving config (bench.py): PyanNet f32 + x-vector bf16,
    distinct SincNet filterbanks — or the VAD engine (segmentation only,
    ``blocks/vad.py`` semantics) with ``vad=True``. (int16 ingestion is a
    session/scheduler option — ``quantize_transfer`` — not an engine one.)"""
    from bench import EMB_REGISTRY, SEG_REGISTRY, _distinct_filterbanks
    from diart_tpu.models import EmbeddingModel, SegmentationModel
    from diart_tpu.parallel import MultiStreamEngine

    seg = SegmentationModel.from_registry(SEG_REGISTRY["pyannet"], dtype="f32")
    emb = None
    if not vad:
        emb = EmbeddingModel.from_registry(EMB_REGISTRY["xvector"], dtype="bf16")
        _distinct_filterbanks(emb)
    return MultiStreamEngine(
        segmentation=seg,
        embedding=emb,
        duration=5.0,
        step=0.5,
        latency=0.5,
        sample_rate=16000,
        max_speakers=20,
        batch_size=batch,
    )


def _state_bytes(state):
    import jax

    return sum(x.nbytes for x in jax.tree_util.tree_leaves(state))


def _stats(xs):
    xs = np.asarray(xs)
    return (
        float(np.percentile(xs, 50)),
        float(np.percentile(xs, 99)),
        float(xs.max()),
    )


def run_config(engine, n_cohorts, mode, args):
    from diart_tpu.parallel import CohortScheduler

    b = engine.batch_size
    step = engine.step_duration
    scheduler = CohortScheduler(
        engine,
        n_cohorts,
        quantize_transfer=args.int16,
        binarize_on_device=not args.no_bits,
    )
    phase = scheduler.phase
    per_session = _state_bytes(scheduler.sessions[0].state)
    print(
        f"# cohorts={n_cohorts} mode={mode} session_state="
        f"{per_session/1e6:.0f}MB total={n_cohorts*per_session/1e9:.2f}GB",
        file=sys.stderr,
        flush=True,
    )

    # distinct audio pool, cycled per hop. No cache-buster needed: the
    # threaded session state is an input of every step executable and its
    # buffers differ hop to hop, so the axon terminal's (executable,
    # inputs) cache can never hit. --staged pre-stages the pool on device
    # (see module docstring).
    rng = np.random.default_rng(0)
    pool = rng.normal(scale=0.1, size=(8, b, engine.step_samples)).astype(
        np.float32
    )
    if args.int16:
        pool = np.clip(pool * 32768.0, -32768, 32767).astype(np.int16)
    pool = list(pool)
    if args.staged:
        import jax

        pool = [jax.device_put(p) for p in pool]
        jax.block_until_ready(pool)

    present = np.ones(b, bool)

    # warm-up: compile (warm() on scratch state) then advance every
    # session past its warm-up boundary so the measured run is all
    # steady-state full-path hops
    scheduler.warm()
    scheduler.prime(lambda j, k: (pool[k % len(pool)], present))

    churn_at = args.periods // 3 if args.churn else -1

    def before_period(p):
        if p == churn_at:
            # admission storm: recycle args.churn lanes of cohort 0 in one
            # compiled churn-batch reset (the server does this per tick)
            idxs = list(range(min(args.churn, b)))
            scheduler.sessions[0].reset_slots(
                idxs, uris=[f"new{i}" for i in idxs]
            )

    counter = {"n": 0}

    def get_blocks(j, p):
        block = pool[counter["n"] % len(pool)]
        counter["n"] += 1
        return block, present

    t0 = time.perf_counter()
    timings = scheduler.run(
        get_blocks,
        args.periods,
        pipelined=(mode != "sync"),
        before_period=before_period,
    )
    elapsed = time.perf_counter() - t0
    n_hops = counter["n"]
    lateness = [t.dispatched - t.due for t in timings]
    reply = [t.done - t.due for t in timings]
    hop_wall = [t.done - t.dispatched for t in timings]
    # sustained = the schedule never fell behind: late starts bounded by
    # one phase slot all run long (no backlog growth), and replies land
    # within one step period
    late_p50, late_p99, late_max = _stats(lateness)
    # trend: compare first-third vs last-third lateness medians
    third = max(1, len(lateness) // 3)
    drift = float(
        np.median(lateness[-third:]) - np.median(lateness[:third])
    )
    rep_p50, rep_p99, rep_max = _stats(reply)
    wall_p50, wall_p99, _ = _stats(hop_wall)
    busy = float(np.sum(hop_wall) / elapsed)
    sustained = bool(
        late_p99 < phase and drift < 0.25 * phase and rep_p99 < step
    )
    streams = n_cohorts * b
    print(
        f"# cohorts={n_cohorts} batch={b} streams={streams} mode={mode} "
        f"periods={args.periods} hops={n_hops} int16={args.int16} "
        f"staged={args.staged} bits={not args.no_bits} vad={args.vad} "
        f"churn={args.churn if churn_at >= 0 else 0} "
        f"hop_wall p50={wall_p50*1e3:.1f}ms p99={wall_p99*1e3:.1f}ms "
        f"lateness p50={late_p50*1e3:.1f}ms p99={late_p99*1e3:.1f}ms "
        f"max={late_max*1e3:.1f}ms drift={drift*1e3:+.1f}ms "
        f"reply p50={rep_p50*1e3:.1f}ms p99={rep_p99*1e3:.1f}ms "
        f"max={rep_max*1e3:.1f}ms busy_frac={busy:.2f} "
        f"sustained={sustained}",
        flush=True,
    )
    del scheduler
    return {
        "cohorts": n_cohorts,
        "mode": mode,
        "streams": streams,
        "sustained": sustained,
        "reply_p50_ms": rep_p50 * 1e3,
        "reply_p99_ms": rep_p99 * 1e3,
        "lateness_p99_ms": late_p99 * 1e3,
        "busy_frac": busy,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--cohorts", default="4,8")
    p.add_argument("--periods", type=int, default=40)
    p.add_argument("--mode", default="sync,pipelined")
    p.add_argument("--churn", type=int, default=0,
                   help="reset this many cohort-0 lanes mid-run")
    p.add_argument("--int16", action="store_true")
    p.add_argument("--no-bits", action="store_true",
                   help="disable the device-binarized packed fetch "
                   "(binarize_on_device) for A/B runs")
    p.add_argument("--vad", action="store_true",
                   help="serve the VAD pipeline (segmentation only, "
                   "~6.7 ms device hop) instead of the flagship")
    p.add_argument("--staged", action="store_true",
                   help="pre-stage audio pools on device (production-PCIe "
                   "proxy: measures the device-side serving claim without "
                   "the dev tunnel's ~100x-slow host->device path)")
    args = p.parse_args()

    import os

    import jax

    from diart_tpu.parallel.mesh import _probe_default_backend, effective_platform

    # dead-tunnel fail-fast (bench.py's rule): jax.devices() on a downed
    # remote-TPU tunnel blocks forever with no error, silently eating an
    # unattended campaign's budget
    platform = effective_platform()
    if (
        not platform.startswith("cpu")
        and os.environ.get("DIART_TPU_SKIP_PROBE") != "1"
    ):
        if _probe_default_backend(platform, timeout=300.0) is None:
            sys.exit(
                f"cohort_bench: JAX platform {platform or '<default>'!r} is "
                "unreachable (remote tunnel down?) — refusing to hang"
            )

    # models are built BEFORE the persistent cache turns on: their init
    # runs on the host CPU backend, and a CPU program compiling >10 s
    # would land a host-specific AOT executable in the shared repo cache
    # (bench.py documents the same ordering)
    engine = _build_engine(args.batch, vad=args.vad)

    if jax.default_backend() != "cpu":
        cache_dir = _ROOT / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    results = []
    for mode in args.mode.split(","):
        for k in (int(x) for x in args.cohorts.split(",")):
            results.append(run_config(engine, k, mode, args))

    best = max(
        (r for r in results if r["sustained"]),
        key=lambda r: r["streams"],
        default=None,
    )
    print(
        json.dumps(
            {
                "metric": "served_streams_per_chip",
                "value": best["streams"] if best else 0,
                "unit": "streams",
                "best_config": best,
                "all": results,
            }
        )
    )


if __name__ == "__main__":
    main()
