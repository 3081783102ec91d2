"""Split the serving hop's HOST cost: device_get deserialization vs RTTM
assembly, at the production batch on the real chip.

Motivation: the round-5 cohort bench collapses at K=32 cohorts (8,192
streams) on the single-core dev host (`docs/campaigns/r5/r5_cohort_k32.txt`)
— attributed to per-hop fetch deserialization + RTTM assembly. This probe
measures each half separately (wall AND thread CPU time, the quantity that
actually serializes across cohort harvest threads on one core), so the
native/bit-packed fixes can be judged against a baseline.

Usage: ``python scripts/serve_host_probe.py [--batch 256] [--hops 30]
[--modes scores,bits]`` — back-to-back A/B of the raw-score fetch vs the
device-binarized packed-bits fetch (``binarize_on_device``). The dense
string-assembly worst case is benched host-only by
``scripts/rttm_native_bench.py``.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def run_one(engine, args, bits):
    import jax

    from diart_tpu.parallel.session import MultiStreamSession

    session = MultiStreamSession(
        engine, collect_audio=False, binarize_on_device=bits
    )
    session.warm()

    rng = np.random.default_rng(0)
    pool = [
        jax.device_put(
            rng.normal(scale=0.1, size=(args.batch, engine.step_samples)).astype(
                np.float32
            )
        )
        for _ in range(8)
    ]
    jax.block_until_ready(pool)
    present = np.ones(args.batch, bool)

    # advance past warm-up
    for k in range(session.warmup_blocks):
        session.push_rttm(pool[k % len(pool)], present)

    # instrument _harvest
    harvest_t = []
    orig_harvest = session._harvest

    def timed_harvest(pending):
        w0, c0 = time.perf_counter(), time.thread_time()
        out = orig_harvest(pending)
        harvest_t.append((time.perf_counter() - w0, time.thread_time() - c0))
        return out

    session._harvest = timed_harvest

    begin_t, finish_t, turns = [], [], []
    for k in range(args.hops):
        block = pool[k % len(pool)]
        w0, c0 = time.perf_counter(), time.thread_time()
        pending = session.push_begin(block, present)
        begin_t.append((time.perf_counter() - w0, time.thread_time() - c0))
        w0, c0 = time.perf_counter(), time.thread_time()
        texts = session.push_finish_rttm(pending)
        finish_t.append((time.perf_counter() - w0, time.thread_time() - c0))
        turns.append(sum(t.count("\n") for t in texts if t))

    def med(pairs, i):
        return float(np.median([p[i] for p in pairs])) * 1e3

    assembly_wall = med(finish_t, 0) - med(harvest_t, 0)
    assembly_cpu = med(finish_t, 1) - med(harvest_t, 1)
    geom = session.engine.geometry
    if bits:
        from diart_tpu.ops.binarize import packed_stride

        nbytes = args.batch * packed_stride(
            geom.num_out, 1 if engine.is_vad else engine.max_speakers
        )
    else:
        nbytes = args.batch * geom.num_out * engine.max_speakers * 4
    print(
        f"# batch={args.batch} hops={args.hops} bits={bits} "
        f"fetch_bytes_per_hop={nbytes} median_turns_per_hop={int(np.median(turns))}"
    )
    print(
        f"push_begin   wall={med(begin_t, 0):7.2f}ms cpu={med(begin_t, 1):7.2f}ms"
    )
    print(
        f"harvest      wall={med(harvest_t, 0):7.2f}ms cpu={med(harvest_t, 1):7.2f}ms"
    )
    print(
        f"assembly     wall={assembly_wall:7.2f}ms cpu={assembly_cpu:7.2f}ms"
    )
    print(
        f"finish total wall={med(finish_t, 0):7.2f}ms cpu={med(finish_t, 1):7.2f}ms"
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--hops", type=int, default=30)
    p.add_argument("--modes", default="scores,bits",
                   help="back-to-back A/B of the fetch modes")
    args = p.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        cache_dir = _ROOT / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    sys.path.insert(0, str(_ROOT / "scripts"))
    from cohort_bench import _build_engine

    engine = _build_engine(args.batch, False)
    for mode in args.modes.split(","):
        run_one(engine, args, bits=(mode == "bits"))


if __name__ == "__main__":
    main()
