"""End-to-end serving measurement: N websocket clients against one chip.

The engine-loop headline (bench.py) measures the chip; this measures the
SERVED path the README claims as the upgrade over the reference's
one-client-per-process websocket server
(``/root/reference/src/diart/sources.py:204-271``,
``console/serve.py:14-131``): real websocket clients streaming synthetic
16 kHz audio at real-time pace into :class:`diart_tpu.runtime.server.
StreamingServer`, which multiplexes them into the stream-batch of one
fused engine.

Per phase (client ramp, default 64/128/256) it reports:

* ``replies_got / replies_expected`` — every post-warm-up hop of every
  client must come back as an RTTM message (sustained real time);
* wire->RTTM latency p50/p99 — client-side clock from sending the block
  that completes a hop to receiving that hop's RTTM line (includes the
  server's <=5 ms tick poll, the device step, and host post-processing);
* server-side dispatch (``push_begin``) and harvest (``push_finish_rttm``)
  wall p50/p99 over the phase — the two halves of a served hop.

The churn phase starts clients, disconnects a third mid-run, and admits
replacements — exercising slot release/claim + the batched
``reset_streams`` under load; dispatch/harvest stability across the churn
is reported. By default everything runs in ONE process/event loop (the
engine step runs in an executor thread and releases the GIL while blocked
on the device); ``--client-procs N`` splits the RAMP cohorts over worker
processes for multi-core hosts — the churn phase always stays in-process
(its stats line says so via ``client_procs``).

Run on the real TPU: ``python scripts/serve_bench.py``; ``--quick`` is a
CPU/CI smoke (tiny models, few clients — numbers not publication-grade).
Prints one JSON line per phase.
"""

import argparse
import asyncio
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 16000


def _build_server(args):
    import jax

    from diart_tpu.models import EmbeddingModel, SegmentationModel
    from diart_tpu.parallel import MultiStreamEngine
    from diart_tpu.runtime.server import StreamingServer

    if args.quick:
        seg = SegmentationModel.from_registry(
            "tpu/pyannet", lstm_hidden=16, lstm_layers=1, linear_dims=(16,),
            init_samples=int(args.duration * SR),
        )
        emb = EmbeddingModel.from_registry(
            "tpu/xvector", embedding_dim=32, init_samples=int(args.duration * SR)
        )
    else:
        from bench import _distinct_filterbanks

        seg = SegmentationModel.from_registry("tpu/pyannet", dtype="f32")
        emb = EmbeddingModel.from_registry("tpu/xvector", dtype="bf16")
        _distinct_filterbanks(emb)
    # Low activity threshold (engine AND binarizer): random-init registry
    # weights produce mid-range sigmoid scores that the production tau=0.6
    # gates to zero — the bench needs an RTTM line per chunk so every
    # hop's reply is measurable. Identical compiled program (tau is a
    # dynamic input of the step).
    engine = MultiStreamEngine(
        segmentation=seg,
        embedding=emb,
        duration=args.duration,
        step=args.step,
        latency=args.step,
        sample_rate=SR,
        max_speakers=4 if args.quick else 20,
        batch_size=args.batch,
        tau_active=0.05,
    )
    # the persistent cache turns on AFTER model construction (bench.py's
    # ordering): model init runs on the host CPU backend, and a CPU init
    # program compiling >10 s would land a host-specific AOT executable
    # in the shared repo cache
    if jax.default_backend() != "cpu":
        cache_dir = Path(__file__).resolve().parent.parent / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    server = StreamingServer(
        engine, tau_active=0.05, host="127.0.0.1", port=args.port,
        realtime=False, quantize_transfer=args.int16,
        coalesce=args.coalesce_ms / 1000.0,
        cohorts=args.cohorts,
    )
    return engine, server


def _precompile(engine, server):
    """Compile every serving executable before clients connect, so phase 1
    measures serving, not the compile service — the step, every pow2
    first-chunk gather bucket, and the churn reset (session.warm)."""
    server.session.warm()


def _client_audio(idx, hops, step_samples):
    rng = np.random.default_rng(1000 + idx)
    t = np.arange(hops * step_samples) / SR
    tone = np.sin(2 * np.pi * (120 + 13 * (idx % 40)) * t)
    w = 0.25 * tone + 0.05 * rng.standard_normal(t.shape)
    return w.astype(np.float32).reshape(hops, step_samples)


def _encode(waveform):
    """The wire format (diart_tpu.utils.encode_audio) without importing
    diart_tpu — client worker processes stay jax-free."""
    import base64

    return base64.b64encode(waveform.astype(np.float32).tobytes()).decode()


def _encode_int16(waveform):
    """diart_tpu.utils.encode_audio_int16 without importing diart_tpu:
    half the wire bytes; preceded by the {"format": "int16"} handshake."""
    import base64

    pcm = np.clip(
        waveform.astype(np.float32) * 32768.0, -32768, 32767
    ).astype(np.int16)
    return base64.b64encode(pcm.tobytes()).decode()


async def _client(
    idx, port, hops, step_dur, step_samples, out, start_evt,
    wire_int16=False,
):
    import websockets

    encode_audio = _encode_int16 if wire_int16 else _encode
    audio = _client_audio(idx, hops, step_samples)
    send_times, recv_times = [], []
    try:
        async with websockets.connect(
            f"ws://127.0.0.1:{port}", max_size=None
        ) as ws:
            if wire_int16:
                await ws.send('{"format": "int16"}')

            async def reader():
                try:
                    while True:
                        await ws.recv()
                        recv_times.append(time.perf_counter())
                except Exception:
                    pass

            rt = asyncio.create_task(reader())
            await start_evt.wait()
            start = time.perf_counter()
            for k in range(hops):
                target = start + k * step_dur
                delay = target - time.perf_counter()
                if delay > 0:
                    await asyncio.sleep(delay)
                send_times.append(time.perf_counter())
                await ws.send(encode_audio(audio[k]))
            # drain the last replies before closing the slot
            await asyncio.sleep(max(2.0, 8 * step_dur))
            rt.cancel()
    except Exception as e:
        out.append({"idx": idx, "error": repr(e)})
        return
    out.append({"idx": idx, "send": send_times, "recv": recv_times})


def _drive_clients(spec, conn):
    """Client-worker subprocess entry: drive ``spec['indices']`` websocket
    clients in this process's own event loop, starting at the shared
    wall-clock deadline ``spec['start_at']``, and pipe the raw per-client
    send/recv timestamp lists back. One event loop cannot pace 256 clients
    at real time (the single-process harness saturated before the server
    did); workers split the cohort. ALWAYS sends (results or an error
    marker) and closes the pipe — a silent crash would leave the parent's
    recv hanging forever."""
    import asyncio
    import time

    results = []
    try:
        async def main():
            evt = asyncio.Event()
            tasks = [
                asyncio.create_task(
                    _client(i, spec["port"], spec["hops"], spec["step_dur"],
                            spec["step_samples"], results, evt,
                            spec["wire_int16"])
                )
                for i in spec["indices"]
            ]
            await asyncio.sleep(max(0.0, spec["start_at"] - time.time()))
            evt.set()
            await asyncio.gather(*tasks)

        asyncio.run(main())
        conn.send(results)
    except BaseException as e:  # noqa: BLE001 — report, don't hang the parent
        try:
            conn.send({"worker_error": repr(e)})
        except Exception:
            pass
        raise
    finally:
        conn.close()


def _phase_stats(results, warmup):
    """Latency pairing is positional (reply j <- the block that completed
    hop warmup-1+j), which is only sound when NO reply was dropped — a
    single gap would shift every later pair by one hop and inflate each
    misaligned sample by ~step_dur. Clients with missing replies are
    therefore excluded from the latency percentiles (their reply counts
    still show in replies_got/expected; ``latency_excluded_clients`` says
    how many were dropped from the timing pool)."""
    lat, errors, got, expected, excluded = [], 0, 0, 0, 0
    for r in results:
        if "error" in r:
            errors += 1
            continue
        send, recv = r["send"], r["recv"]
        n_expected = max(0, len(send) - warmup + 1)
        expected += n_expected
        got += len(recv)
        if len(recv) != n_expected:
            excluded += 1
            continue
        for j, tr in enumerate(recv):
            k = warmup - 1 + j
            lat.append(tr - send[k])
    lat = np.asarray(lat)
    return {
        "clients_errored": errors,
        "replies_expected": expected,
        "replies_got": got,
        "latency_excluded_clients": excluded,
        "wire_rttm_p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1)
        if lat.size else None,
        "wire_rttm_p99_ms": round(float(np.percentile(lat, 99)) * 1000, 1)
        if lat.size else None,
        "wire_rttm_max_ms": round(float(lat.max()) * 1000, 1)
        if lat.size else None,
    }


def _step_stats(step_log, t0, t1, prefix="step"):
    durs = [d for (t, d, n) in step_log if t0 <= t <= t1]
    ns = [n for (t, d, n) in step_log if t0 <= t <= t1]
    if not durs:
        return {}
    plural = f"{prefix}es" if prefix.endswith(("ch", "sh")) else f"{prefix}s"
    return {
        plural: len(durs),
        f"{prefix}_p50_ms": round(float(np.percentile(durs, 50)) * 1000, 2),
        f"{prefix}_p99_ms": round(float(np.percentile(durs, 99)) * 1000, 2),
        f"{prefix}_present_max": int(max(ns)),
    }


async def _run(args):
    engine, server = _build_server(args)
    warmup = int(round(engine.duration / engine.step_duration))

    # instrument BOTH halves of the pipelined serving path: dispatch
    # (push_begin, what the ticker blocks on) and harvest (push_finish,
    # overlapped with the next hop's dispatch)
    begin_log, finish_log = [], []
    orig_begin = server.session.push_begin
    orig_finish = server.session.push_finish_rttm

    def timed_begin(blocks, present=None):
        t0 = time.perf_counter()
        pending = orig_begin(blocks, present)
        begin_log.append(
            (t0, time.perf_counter() - t0,
             int(np.sum(present)) if present is not None else blocks.shape[0])
        )
        return pending

    def timed_finish(pending):
        t0 = time.perf_counter()
        out = orig_finish(pending)
        finish_log.append(
            (t0, time.perf_counter() - t0, int(np.sum(pending.run_mask)))
        )
        return out

    server.session.push_begin = timed_begin
    server.session.push_finish_rttm = timed_finish
    # with --cohorts > 1 the ticker drives EVERY session; instrumenting
    # only sessions[0] would silently report half (or 1/K) of the hops
    for sess in server.sessions[1:]:
        def _mk_begin(s=sess, orig=None):
            orig = s.push_begin

            def timed(blocks, present=None, **kw):
                t0 = time.perf_counter()
                pending = orig(blocks, present, **kw)
                begin_log.append(
                    (t0, time.perf_counter() - t0,
                     int(np.sum(present)) if present is not None
                     else blocks.shape[0])
                )
                return pending

            return timed

        def _mk_finish(s=sess):
            orig = s.push_finish_rttm

            def timed(pending):
                t0 = time.perf_counter()
                out = orig(pending)
                finish_log.append(
                    (t0, time.perf_counter() - t0,
                     int(np.sum(pending.run_mask)))
                )
                return out

            return timed

        sess.push_begin = _mk_begin()
        sess.push_finish_rttm = _mk_finish()

    print("# compiling (pre-client warm-up)...", file=sys.stderr, flush=True)
    _precompile(engine, server)
    server_task = asyncio.create_task(server.serve(warm=False))
    await asyncio.sleep(0.5)

    async def run_phase(n_clients, hops, tag):
        loop = asyncio.get_running_loop()
        if args.client_procs > 1:
            # split the cohort over worker processes: one event loop cannot
            # encode+pace 256 real-time clients (harness saturation shows
            # up as wire latency the server never caused)
            import multiprocessing as mp

            ctx = mp.get_context("spawn")
            start_at = time.time() + 5.0 + n_clients / 100.0
            procs, pipes = [], []
            for part in np.array_split(np.arange(n_clients), args.client_procs):
                if not part.size:
                    continue
                parent, child = ctx.Pipe()
                spec = {
                    "indices": [int(i) for i in part],
                    "port": args.port,
                    "hops": hops,
                    "step_dur": engine.step_duration,
                    "step_samples": engine.step_samples,
                    "start_at": start_at,
                    "wire_int16": args.wire_int16,
                }
                p = ctx.Process(target=_drive_clients, args=(spec, child))
                p.start()
                # close the parent's duplicate of the child end: otherwise
                # a worker that dies before sending leaves the pipe open
                # forever and recv below never raises EOFError
                child.close()
                procs.append(p)
                pipes.append(parent)
            await asyncio.sleep(max(0.0, start_at - time.time()))
            t0 = time.perf_counter()
            results = []
            for parent in pipes:
                try:
                    part = await loop.run_in_executor(None, parent.recv)
                except EOFError:
                    sys.exit("serve_bench: a client worker died without "
                             "reporting results")
                if isinstance(part, dict) and "worker_error" in part:
                    sys.exit(f"serve_bench: client worker failed: "
                             f"{part['worker_error']}")
                results.extend(part)
            for p in procs:
                p.join()
            t1 = time.perf_counter()
        else:
            results = []
            start_evt = asyncio.Event()
            tasks = [
                asyncio.create_task(
                    _client(i, args.port, hops, engine.step_duration,
                            engine.step_samples, results, start_evt,
                            args.wire_int16)
                )
                for i in range(n_clients)
            ]
            await asyncio.sleep(0.2 + n_clients / 500.0)  # let slots claim
            t0 = time.perf_counter()
            start_evt.set()
            await asyncio.gather(*tasks)
            t1 = time.perf_counter()
        stats = {
            "phase": tag,
            "clients": n_clients,
            "hops": hops,
            "client_procs": max(1, args.client_procs),
            "pipelined": server.pipelined,
            "coalesce_ms": round(server.coalesce * 1000, 1),
            "wire_int16": args.wire_int16,
            **_phase_stats(results, warmup),
            **_step_stats(begin_log, t0, t1, prefix="dispatch"),
            **_step_stats(finish_log, t0, t1, prefix="harvest"),
        }
        print(json.dumps(stats), flush=True)
        await asyncio.sleep(1.0)  # slots release
        return stats

    for n in args.ramp:
        if args.wire_ab:
            # back-to-back f32-wire vs int16-wire A/B per client count
            # (same server, same process — the only honest comparison on
            # the time-shared dev chip)
            base = args.wire_int16
            for mode in ("f32", "i16"):
                args.wire_int16 = mode == "i16"
                await run_phase(n, args.hops, f"ramp{n}_{mode}")
            args.wire_int16 = base
        elif args.pipeline_ab:
            # back-to-back sync-vs-pipelined A/B per client count — the
            # only honest comparison on the time-shared dev chip (single
            # runs move with contention; PERF.md "Headline reconciliation")
            default_pipelined = server.pipelined
            for mode in ("sync", "pipe"):
                server.pipelined = mode == "pipe"
                await run_phase(n, args.hops, f"ramp{n}_{mode}")
            server.pipelined = default_pipelined
        else:
            await run_phase(n, args.hops, f"ramp{n}")

    # ---- churn phase: disconnect a third mid-run, admit replacements --- #
    n = args.churn_clients
    kill = n // 3
    results = []
    start_evt = asyncio.Event()
    long_tasks = [
        asyncio.create_task(
            _client(i, args.port, args.hops, engine.step_duration,
                    engine.step_samples, results, start_evt,
                    args.wire_int16)
        )
        for i in range(n - kill)
    ]
    short_tasks = [
        asyncio.create_task(
            _client(1000 + i, args.port, args.hops // 2,
                    engine.step_duration, engine.step_samples, results,
                    start_evt, args.wire_int16)
        )
        for i in range(kill)
    ]
    await asyncio.sleep(0.2 + n / 500.0)
    t0 = time.perf_counter()
    start_evt.set()
    await asyncio.gather(*short_tasks)  # these finish + release slots
    t_mid = time.perf_counter()
    # replacements claim the freed slots mid-run
    evt2 = asyncio.Event()
    repl_tasks = [
        asyncio.create_task(
            _client(2000 + i, args.port, args.hops // 2,
                    engine.step_duration, engine.step_samples, results, evt2,
                    args.wire_int16)
        )
        for i in range(kill)
    ]
    await asyncio.sleep(0.2)
    evt2.set()
    await asyncio.gather(*long_tasks, *repl_tasks)
    t1 = time.perf_counter()
    stats = {
        "phase": "churn",
        "clients": n,
        "churned": kill,
        # the churn choreography (staggered short/replacement cohorts)
        # always runs in the server's event loop, even when the ramp
        # phases used --client-procs workers
        "client_procs": 1,
        **_phase_stats(results, warmup),
        "pre_churn": {
            **_step_stats(begin_log, t0, t_mid, prefix="dispatch"),
            **_step_stats(finish_log, t0, t_mid, prefix="harvest"),
        },
        "post_churn": {
            **_step_stats(begin_log, t_mid, t1, prefix="dispatch"),
            **_step_stats(finish_log, t_mid, t1, prefix="harvest"),
        },
    }
    print(json.dumps(stats), flush=True)

    server.close()
    await asyncio.sleep(0.2)
    server_task.cancel()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=7801)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--cohorts", type=int, default=1,
                   help="server cohorts: capacity = cohorts * batch; ramp "
                   "phases past `batch` clients land in higher cohorts "
                   "(websocket-level exercise of the cohort scheduler; the "
                   "device-side capacity claim is cohort_bench.py's)")
    p.add_argument("--ramp", default="64,128,256",
                   help="comma-separated client counts")
    p.add_argument("--hops", type=int, default=40,
                   help="0.5 s blocks per client per phase")
    p.add_argument("--churn-clients", type=int, default=128)
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--step", type=float, default=0.5)
    p.add_argument("--client-procs", type=int, default=None,
                   help="split the client cohort over N worker processes "
                   "(1 = drive all clients in the server's event loop). "
                   "Default 1: on the 1-core dev host, worker processes "
                   "only add context-switch thrash (measured: ramp256 got "
                   "worse, docs/campaigns/r4/r4_serve3.txt); use >1 only "
                   "on multi-core hosts")
    p.add_argument("--int16", action="store_true",
                   help="ship int16 PCM blocks to the device (server-side "
                   "quantize_transfer: half the host->device bytes per hop)")
    p.add_argument("--wire-int16", action="store_true",
                   help="clients send int16 PCM over the websocket (half "
                   "the wire bytes; combined with --int16 the audio stays "
                   "int16 from wire to device)")
    p.add_argument("--wire-ab", action="store_true",
                   help="run each ramp phase twice back to back: f32 wire "
                   "vs int16 wire (same server process)")
    p.add_argument("--pipeline-ab", action="store_true",
                   help="run each ramp phase twice back to back: "
                   "synchronous push vs pipelined dispatch/harvest")
    p.add_argument("--coalesce-ms", type=float, default=0.0,
                   help="server-side wave coalescing hold (ms; 0 = "
                   "dispatch partial waves immediately — the measured "
                   "default, see PERF.md round-4 serving)")
    p.add_argument("--quick", action="store_true",
                   help="tiny models / CPU smoke")
    args = p.parse_args()
    args.ramp = [int(x) for x in args.ramp.split(",") if x]
    if not args.quick:
        # dead-tunnel fail-fast (bench.py's rule): jax.devices() on a
        # downed remote-TPU tunnel blocks forever with no error
        import os

        from diart_tpu.parallel.mesh import (
            _probe_default_backend,
            effective_platform,
        )

        platform = effective_platform()
        if (
            not platform.startswith("cpu")
            and os.environ.get("DIART_TPU_SKIP_PROBE") != "1"
        ):
            if _probe_default_backend(platform, timeout=300.0) is None:
                sys.exit(
                    f"serve_bench: JAX platform {platform or '<default>'!r} "
                    "is unreachable (remote tunnel down?) — refusing to hang"
                )
    if args.quick:
        # CPU smoke: select the CPU backend before first backend use (the
        # env pins the remote platform; see .claude/skills/verify)
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.batch = min(args.batch, 8)
        capacity = args.batch * args.cohorts
        args.ramp = [min(r, capacity) for r in args.ramp[:1]]
        args.hops = min(args.hops, 14)
        args.churn_clients = min(args.churn_clients, args.batch)
        args.duration, args.step = 1.0, 0.25
    if args.client_procs is None:
        args.client_procs = 1
    if max(args.ramp + [args.churn_clients]) > args.batch * args.cohorts:
        sys.exit("ramp/churn client counts must fit --batch * --cohorts")
    asyncio.run(_run(args))


if __name__ == "__main__":
    main()
