"""Host-side session management for the fused multi-stream engine.

Bridges the device engine (:class:`diart_tpu.parallel.MultiStreamEngine`)
to the annotation world: tracks per-stream warm-up (the reference re-chunker
only emits once a full chunk accumulated, ``operators.py:92-99``), rebuilds
the first-chunk prepend (``aggregation.py:188-212``), binarizes the
latency-delayed scores, applies per-stream timestamp shifts, and slices the
corresponding audio region — producing exactly the (Annotation, waveform)
pairs the reference pipelines emit per chunk
(``blocks/diarization.py:157-234``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..core.annotation import Annotation
from ..core.segment import SlidingWindow, SlidingWindowFeature
from ..ops.binarize import (
    batch_binarize_rttm,
    batch_bits_rttm,
    binarize,
    binarize_rttm,
)
from .. import native
from .engine import MultiStreamEngine, StreamState

__all__ = ["MultiStreamSession"]

# ONE jitted pack function for the whole process (not per-session): jit
# caches compiled executables per wrapper, so a per-session wrapper would
# re-trace/re-compile for every cohort — and since warm() runs on cohort
# 0's session only, cohorts 1..K-1 would pay that compile inside their
# FIRST serving hop (the first-tick stall class warm() exists to
# eliminate). pack_binarized_bits is a pure function of (shape, dtype),
# so one wrapper serves every engine geometry.
import threading as _threading

_pack_jit = None
_pack_jit_lock = _threading.Lock()


def _shared_pack_fn():
    global _pack_jit
    if _pack_jit is None:
        with _pack_jit_lock:
            if _pack_jit is None:
                from ..ops.binarize import pack_binarized_bits

                _pack_jit = jax.jit(pack_binarized_bits)
    return _pack_jit


@dataclass
class _PendingHop:
    """A dispatched-but-not-harvested hop (see ``push_begin``): the device
    arrays to fetch plus host-side snapshots of everything the assembly
    needs, so slot churn between dispatch and harvest can't corrupt it."""

    fetch: list
    run_mask: np.ndarray
    chunk_index: np.ndarray
    first_rows: np.ndarray
    uris: List[str]
    shifts: List[float]
    # fetch[0] is packed device-binarized bits (binarize_on_device mode)
    # instead of the raw aggregated scores; device_aggregated keeps the
    # on-device scores reachable for the annotation route either way.
    bits: bool = False
    device_aggregated: object = None
    t0: float = field(default_factory=time.monotonic)


class MultiStreamSession:
    """Drives N concurrent streams and assembles per-stream outputs.

    Parameters
    ----------
    engine: the compiled multi-stream engine.
    uris: stream identifiers (len == engine.batch_size).
    tau_active: binarization threshold (``blocks/diarization.py:119``).
    timestamp_shifts: per-stream shift applied to output timestamps
        (negative left padding, as in ``inference.py:339``).
    collect_audio: also return the aggregated audio region per output.
    quantize_transfer: ship int16 PCM blocks to the device (half the
        host->device bytes; dequantized on device, exact to 1/32768).
    binarize_on_device: RTTM-route hops fetch a device-binarized packed
        bitmap (one bit per (frame, speaker) cell, 32x fewer device->host
        bytes) instead of raw f32 scores — bit-exact by construction (see
        ``ops.binarize.pack_binarized_bits``) and the lever behind the
        cohort serving ceiling (PERF.md round 5). The annotation route
        (:meth:`push`) always fetches raw scores.
    """

    def __init__(
        self,
        engine: MultiStreamEngine,
        uris: Optional[Sequence[str]] = None,
        tau_active: float = 0.6,
        timestamp_shifts: Optional[Sequence[float]] = None,
        collect_audio: bool = True,
        quantize_transfer: bool = False,
        binarize_on_device: bool = True,
    ):
        self.engine = engine
        b = engine.batch_size
        self.uris = list(uris) if uris is not None else [f"stream{i}" for i in range(b)]
        assert len(self.uris) == b
        self.tau_active = tau_active
        self.shifts = list(timestamp_shifts) if timestamp_shifts else [0.0] * b
        self.collect_audio = collect_audio
        # ship int16 PCM to the device (half the host->device bytes per hop;
        # ~96 dB quantization floor is far below speech SNR)
        self.quantize_transfer = quantize_transfer
        # Serving fetch path: threshold the aggregated scores ON DEVICE
        # (bit-identical f32 compare, ops/binarize.pack_binarized_bits) and
        # fetch ~30x fewer bytes per hop — 8 binarized cells per byte vs an
        # f32 score each. At cohort scale the raw-score fetch saturates the
        # device->host link (PERF.md round 5: 32 cohorts x 614 KB/hop ~=
        # 39 MB/s collapsed the dev tunnel); the RTTM routes never need the
        # scores themselves. The annotation route (push/push_finish) still
        # fetches full scores on demand, so this is safe to leave on; turn
        # it off to make push_finish's fetch part of the hop again.
        self.binarize_on_device = binarize_on_device

        self.state: StreamState = engine.init_state()
        self.blocks_seen = np.zeros(b, np.int64)
        # wall-clock per push, for observability (reference Chronometer
        # semantics, utils.py:13-43)
        from ..utils import Chronometer

        self.chronometer = Chronometer("step")
        self.warmup_blocks = int(
            round(engine.duration / engine.step_duration)
        )  # blocks per full chunk
        # dispatched-but-unharvested hops; guards the collect_audio
        # restriction below (push_begin docstring) with an error instead
        # of silently corrupted audio regions. Incremented on the dispatch
        # thread, decremented on the harvest thread under the pipelined
        # server — the lock keeps the read-modify-write atomic so the
        # counter cannot drift across threads.
        import threading

        self._inflight_lock = threading.Lock()
        self._inflight_hops = 0
        if self.collect_audio:
            self._audio = np.zeros((b, engine.chunk_samples), np.float32)

    @property
    def batch_size(self) -> int:
        return self.engine.batch_size

    def reset_slot(self, index: int, uri: Optional[str] = None, shift: float = 0.0):
        """Recycle a stream slot for a new session."""
        self.reset_slots([index], uris=None if uri is None else [uri], shifts=[shift])

    def reset_slots(
        self,
        indices: Sequence[int],
        uris: Optional[Sequence[Optional[str]]] = None,
        shifts: Optional[Sequence[float]] = None,
    ) -> None:
        """Recycle several stream slots in ONE compiled device call
        (``engine.reset_streams``) — client-churn batches in the streaming
        server reset every newly claimed slot per tick without a per-index
        device round trip."""
        indices = list(indices)
        if not indices:
            return
        mask = np.zeros((self.batch_size,), bool)
        mask[np.asarray(indices, int)] = True
        self.state = self.engine.reset_streams(self.state, mask)
        for k, index in enumerate(indices):
            self.blocks_seen[index] = 0
            self.shifts[index] = shifts[k] if shifts is not None else 0.0
            if uris is not None and uris[k] is not None:
                self.uris[index] = uris[k]
            if self.collect_audio:
                self._audio[index] = 0.0

    def warm(self) -> None:
        """Compile every executable the serving loop can hit, before any
        real client connects: the step (warm-up and steady state), every
        pow2 first-chunk gather bucket, and the churn-batch reset.

        A cold executable costs seconds through a compile service (the
        serve_bench ramp phases each stalled 3+ s on the first-chunk
        gather buckets as fresh client cohorts joined, backing the server
        up past real time). Runs on a SCRATCH state — session state and
        bookkeeping are untouched, so this is safe at any point in a
        server's life, not just at start."""
        # The native RTTM assembler is compiled lazily on first use — a
        # ~2 s (bounded 120 s) subprocess compile that would otherwise
        # land inside the first serving hop's harvest, the exact
        # first-tick stall class this method exists to eliminate.
        native.rttm_available()
        eng = self.engine
        b = self.batch_size
        blocks = np.zeros((b, eng.step_samples), np.float32)
        if self.quantize_transfer:
            blocks = blocks.astype(np.int16)
        state = eng.init_state()
        present = np.ones(b, bool)
        out = None
        for k in range(self.warmup_blocks + 1):
            run = present & (k + 1 >= self.warmup_blocks)
            state, out = eng.step(state, blocks, present, run)
        packed = [self._pack(out.aggregated)] if self.binarize_on_device else []
        width = 1
        while True:
            w = min(width, b)
            fetch = [out.aggregated, out.newest[np.zeros(w, int)]] + packed
            if self.binarize_on_device:
                # bits-mode first-chunk buckets also gather aggregated rows
                fetch.append(out.aggregated[np.zeros(w, int)])
            jax.device_get(fetch)
            if w >= b:
                break
            width *= 2
        eng.reset_streams(state, present)

    # ------------------------------------------------------------------ #
    # Checkpoint / resume (fault recovery for long-running streams — the
    # reference has no state lifecycle beyond reset(), SURVEY.md §5)
    # ------------------------------------------------------------------ #
    def save(self, path) -> None:
        """Persist the full session (device state + host bookkeeping)."""
        import json
        from pathlib import Path

        from flax import serialization

        path = Path(path)
        path.write_bytes(serialization.to_bytes(self.state))
        meta = {
            "uris": self.uris,
            "shifts": self.shifts,
            "blocks_seen": self.blocks_seen.tolist(),
            "tau_active": self.tau_active,
            # which fast paths produced this state — declared policy plus
            # the post-resolution switches (env overrides + backend gate),
            # so the numerics of a checkpoint are reproducible
            "precision": self.engine.precision.as_dict(),
            "precision_resolved": self.engine.precision.resolved(),
        }
        if self.collect_audio:
            np.save(path.with_suffix(".audio.npy"), self._audio)
        path.with_suffix(".json").write_text(json.dumps(meta))

    def restore(self, path) -> None:
        """Resume a previously saved session (same engine geometry)."""
        import json
        from pathlib import Path

        from flax import serialization

        path = Path(path)
        self.state = serialization.from_bytes(self.state, path.read_bytes())
        meta = json.loads(path.with_suffix(".json").read_text())
        self.uris = list(meta["uris"])
        self.shifts = list(meta["shifts"])
        self.blocks_seen = np.asarray(meta["blocks_seen"], np.int64)
        self.tau_active = meta["tau_active"]
        audio_path = path.with_suffix(".audio.npy")
        if self.collect_audio and audio_path.exists():
            self._audio = np.load(audio_path)

    def push(
        self,
        blocks: np.ndarray,
        present: Optional[np.ndarray] = None,
    ) -> List[Optional[Tuple[Annotation, Optional[SlidingWindowFeature]]]]:
        """Feed one step-sized block per stream; return per-stream outputs.

        blocks: (B, step_samples); present: (B,) bool mask of streams that
        actually have new audio (others are frozen this tick).

        Returns a list with one entry per stream: ``None`` while warming up
        or absent, else ``(annotation, audio_region)``.
        """
        pending = self.push_begin(blocks, present, rttm=False)
        if pending is None:
            return [None] * self.batch_size
        return self.push_finish(pending)

    def push_begin(
        self,
        blocks: np.ndarray,
        present: Optional[np.ndarray] = None,
        rttm: bool = True,
    ) -> Optional["_PendingHop"]:
        """Dispatch one hop WITHOUT blocking on the device: advances the
        session state, enqueues the step (and the first-chunk gather when
        needed), and returns an opaque pending handle — or ``None`` when no
        stream produced output this hop (warm-up).

        ``push_finish(pending)`` blocks on the transfer and assembles the
        per-stream outputs. Splitting the two lets a serving loop overlap
        hop k's device->host fetch + RTTM assembly with hop k+1's dispatch
        (SURVEY §7: async dispatch so emission doesn't block the next hop).
        Rules: ``push_begin`` calls must stay serial (state threading), and
        every pending must be finished in dispatch order. The handle
        snapshots uris/shifts/chunk indices, so slot resets may proceed
        while a hop is in flight — but ``collect_audio=True`` sessions must
        use the synchronous :meth:`push` (resets zero audio rows in place).

        rttm: the finish route this hop is destined for. True (serving
        loops -> ``push_finish_rttm``) lets ``binarize_on_device`` replace
        the raw score fetch with the packed-bits fetch; False
        (``push`` -> ``push_finish``) always fetches raw scores.
        """
        b = self.batch_size
        if present is None:
            present = np.ones(b, bool)
        present = np.asarray(present, bool)

        if self.collect_audio and self._inflight_hops:
            # the rolling audio window advances in place below, so an
            # unfinished hop's push_finish would slice the NEXT hop's
            # samples — refuse rather than silently emit wrong audio
            raise RuntimeError(
                "push_begin with a hop still in flight requires "
                "collect_audio=False (the audio ring advances in place); "
                "finish the pending hop first or use the synchronous push"
            )

        self.blocks_seen[present] += 1
        run_mask = present & (self.blocks_seen >= self.warmup_blocks)

        if self.collect_audio:
            upd = np.concatenate(
                [self._audio[:, self.engine.step_samples :], blocks], axis=1
            )
            self._audio = np.where(present[:, None], upd, self._audio)

        device_blocks = blocks
        # .dtype directly, NOT np.asarray(blocks).dtype: blocks may already
        # be a device array (pre-staged pools), and np.asarray on one is a
        # full device->host fetch just to read the dtype
        if self.quantize_transfer and not np.issubdtype(
            np.dtype(blocks.dtype), np.integer
        ):
            device_blocks = np.clip(
                np.asarray(blocks) * 32768.0, -32768, 32767
            ).astype(np.int16)

        t0 = time.monotonic()
        self.state, out = self.engine.step(
            self.state, device_blocks, present, run_mask
        )
        if not run_mask.any():
            return None

        # The chunk index of the chunk just emitted is host-derivable —
        # every present push increments blocks_seen and the stream runs
        # exactly when blocks_seen >= warmup, so
        # ``chunk_index = blocks_seen - warmup_blocks`` (the engine's
        # ``out.chunk_index`` computes the same value on device; pinned
        # equal by tests/test_runtime.py). Deriving it here both saves a
        # device->host round trip per hop AND lets the first-chunk gather
        # below be dispatched BEFORE the blocking fetch.
        chunk_index = self.blocks_seen - self.warmup_blocks
        # ``newest`` (B, frames, M) is ~6x ``aggregated``'s bytes at the
        # default geometry and is only consumed by the first-chunk prepend
        # (c == 0, aggregation.py:188-212 semantics): fetch just those
        # streams' rows (device-side gather) instead of shipping the full
        # tensor to the host every hop — in steady state nothing is
        # fetched. Measured against the serving loop: the full-tensor
        # fetch dominated the per-hop device<->host traffic.
        first_rows = np.flatnonzero(run_mask & (chunk_index == 0))
        # rttm=False (the annotation route, session.push) keeps the raw
        # aggregated fetch — push_finish needs the scores themselves, so
        # the packed-bits fetch would only add a second round trip
        bits = self.binarize_on_device and rttm
        fetch = [self._pack(out.aggregated) if bits else out.aggregated]
        if first_rows.size:
            # pad the index vector to the next power of two so the gather
            # executable is reused across hops (at most log2(B)+1 variants
            # ever compile) instead of one compile per distinct row count
            width = min(b, 1 << (int(first_rows.size) - 1).bit_length())
            idx = np.pad(
                first_rows, (0, width - first_rows.size), mode="edge"
            )
            fetch.append(out.newest[idx])
            if bits:
                # the first-chunk prepend needs those streams' raw
                # aggregated rows too (the packed fetch replaced them)
                fetch.append(out.aggregated[idx])
        with self._inflight_lock:
            self._inflight_hops += 1
        return _PendingHop(
            fetch=fetch,
            run_mask=run_mask,
            chunk_index=chunk_index.copy(),
            first_rows=first_rows,
            uris=list(self.uris),
            shifts=list(self.shifts),
            bits=bits,
            device_aggregated=out.aggregated,
            t0=t0,
        )

    def _pack(self, aggregated):
        """Dispatch the device-side binarize+packbits of this hop's
        aggregated scores (``ops.binarize.pack_binarized_bits``). The
        jitted wrapper is process-global so every cohort's session shares
        the executables warm() compiled."""
        return _shared_pack_fn()(aggregated, np.float32(self.tau_active))

    def _harvest(self, pending: "_PendingHop"):
        """Block on a pending hop's transfers: ONE ``device_get`` on the
        fetch list (sequential ``np.asarray`` calls each paid a full
        host<->device round trip, ~50 ms through the dev tunnel — the
        serve_bench ramp phases showed 2-3 sequential fetches dominating
        the served step wall). Returns ``(main, newest_rows, agg_rows)``:
        ``main`` is the aggregated scores, or the packed binarized bits in
        ``binarize_on_device`` mode (where ``agg_rows`` carries the raw
        aggregated rows of first-chunk streams)."""
        fetch = jax.device_get(pending.fetch)
        main = fetch[0]
        newest_rows = {}
        agg_rows = {}
        if pending.first_rows.size:
            newest_rows = {
                int(r): fetch[1][k] for k, r in enumerate(pending.first_rows)
            }
            if pending.bits:
                agg_rows = {
                    int(r): fetch[2][k]
                    for k, r in enumerate(pending.first_rows)
                }
        self.chronometer.history.append(time.monotonic() - pending.t0)
        with self._inflight_lock:
            self._inflight_hops = max(0, self._inflight_hops - 1)
        return main, newest_rows, agg_rows

    def push_finish(
        self, pending: "_PendingHop"
    ) -> List[Optional[Tuple[Annotation, Optional[SlidingWindowFeature]]]]:
        """Block on a pending hop's transfers and assemble its outputs."""
        b = self.batch_size
        run_mask = pending.run_mask
        chunk_index = pending.chunk_index
        aggregated, newest_rows, _ = self._harvest(pending)
        if pending.bits:
            # the annotation route needs the raw scores; in
            # binarize_on_device mode the hop only fetched the packed bits,
            # so fetch the full tensor now (serving loops use the RTTM
            # routes and never pay this)
            aggregated = jax.device_get(pending.device_aggregated)

        geometry = self.engine.geometry
        eng = self.engine
        outputs: List[Optional[Tuple[Annotation, Optional[SlidingWindowFeature]]]] = []
        for i in range(b):
            if not run_mask[i]:
                outputs.append(None)
                continue
            c = int(chunk_index[i])
            shift = pending.shifts[i]
            if c == 0:
                # first-chunk prepend: cover [0, duration - latency + step]
                first = newest_rows[i][geometry.first_indices].copy()
                first[-geometry.num_out :] = aggregated[i]
                res = geometry.first_resolution
                window = SlidingWindow(start=shift, duration=res, step=res)
                scores = SlidingWindowFeature(first, window)
                region_start, region_len = 0.0, first.shape[0] * res
            else:
                res = geometry.out_resolution
                start = eng.output_start(c)
                window = SlidingWindow(start=start + shift, duration=res, step=res)
                scores = SlidingWindowFeature(aggregated[i], window)
                region_start = start - c * eng.step_duration  # offset in window
                region_len = eng.step_duration

            annotation = binarize(scores, self.tau_active, uri=pending.uris[i])

            audio = None
            if self.collect_audio:
                sr = eng.sample_rate
                lo = int(round(region_start * sr))
                hi = min(lo + int(round(region_len * sr)), eng.chunk_samples)
                data = self._audio[i, lo:hi, None]
                audio = SlidingWindowFeature(
                    data,
                    SlidingWindow(
                        start=(0.0 if c == 0 else eng.output_start(c)) + shift,
                        duration=1.0 / sr,
                        step=1.0 / sr,
                    ),
                )
            outputs.append((annotation, audio))
        return outputs

    def push_rttm(
        self,
        blocks: np.ndarray,
        present: Optional[np.ndarray] = None,
    ) -> List[Optional[str]]:
        """``push`` for the serving wire: one RTTM text per stream (``None``
        while warming up / absent) instead of ``(Annotation, audio)``."""
        pending = self.push_begin(blocks, present)
        if pending is None:
            return [None] * self.batch_size
        return self.push_finish_rttm(pending)

    def push_finish_rttm(
        self, pending: "_PendingHop"
    ) -> List[Optional[str]]:
        """``push_finish`` that emits per-stream RTTM text directly.

        The serving loop only ships RTTM lines back over the websocket, and
        the annotation route's per-turn ``Segment``/``Annotation`` churn
        costs more host time per hop than the device step at serving batch
        sizes (measured at 256 streams: 14.9 ms/hop for smooth 2-speaker
        activity vs the 11.9 ms device step — the "~0.1 ms/stream host
        post-processing" production floor, PERF.md round-4 serving). Here
        all steady-state streams go through ONE batched transition pass
        (``ops.binarize.batch_binarize_rttm``; first-chunk streams keep the
        per-stream route — their prepended window has its own length and
        resolution). String equality with
        ``push_finish(...)[i][0].to_rttm()`` is pinned by
        tests/test_engine.py::TestRttmFastPath."""
        b = self.batch_size
        run_mask = pending.run_mask
        chunk_index = pending.chunk_index
        main, newest_rows, agg_rows = self._harvest(pending)

        geometry = self.engine.geometry
        eng = self.engine
        outputs: List[Optional[str]] = [None] * b

        steady_mask = run_mask & (chunk_index > 0)
        if steady_mask.any():
            res = geometry.out_resolution
            # per-stream window starts (don't-care for non-emitting rows),
            # in engine.output_start's exact float operation order
            # (((c * step) + duration) - latency) + shift so the %.3f
            # renderings stay bit-identical to the per-stream route
            starts = (
                chunk_index * eng.step_duration
                + eng.duration
                - eng.latency
                + np.asarray(pending.shifts)
            )
            speakers = int(pending.device_aggregated.shape[-1])
            if pending.bits:
                texts = native.rttm_from_bits(
                    main,
                    geometry.num_out,
                    speakers,
                    starts,
                    res,
                    pending.uris,
                    emit=steady_mask,
                )
                fallback = lambda rows, uris: batch_bits_rttm(
                    main[rows], geometry.num_out, speakers,
                    starts[rows], res, uris,
                )
            else:
                texts = native.rttm_from_scores(
                    main, starts, res, self.tau_active, pending.uris,
                    emit=steady_mask,
                )
                fallback = lambda rows, uris: batch_binarize_rttm(
                    np.asarray(main[rows]), starts[rows], res,
                    self.tau_active, uris,
                )
            if texts is None:  # no native toolchain: numpy fallback
                rows = np.flatnonzero(steady_mask)
                sub = fallback(rows, [pending.uris[i] for i in rows])
                texts = [None] * b
                for k, i in enumerate(rows):
                    texts[i] = sub[k]
            for i in np.flatnonzero(steady_mask):
                outputs[i] = texts[i]

        for i in range(b):
            if not run_mask[i] or int(chunk_index[i]) != 0:
                continue
            agg_row = agg_rows[i] if pending.bits else main[i]
            first = newest_rows[i][geometry.first_indices].copy()
            first[-geometry.num_out :] = agg_row
            res0 = geometry.first_resolution
            window = SlidingWindow(
                start=pending.shifts[i], duration=res0, step=res0
            )
            outputs[i] = binarize_rttm(
                SlidingWindowFeature(first, window),
                self.tau_active,
                uri=pending.uris[i],
            )
        return outputs
