"""On-chip fidelity of the fbank_ring path at production geometry.

``fbank_ring`` keeps the embedding's raw log-mel frames of the unchanged
4.5 s of each window in a chronological device ring so every hop computes
only the new block's frames (``parallel/engine.py:_fring_advance``). The
CPU suite (tests/test_fbank_ring.py) pins engine-output parity at toy
sizes; this probe is the bar the default flip requires — the same one
``fast_fbank`` cleared (scripts/fbank_fidelity.py): measure, ON THE CHIP
at the full serving geometry (5 s / 0.5 s, full-size models, distinct
filterbanks, flagship precision), what reaches the decisions:

* embedding cosine ring-vs-direct per hop (embeddings only feed cosine
  distances for clustering — reference ``blocks/clustering.py:170-176``),
  via the engine's non-mutating ``probe_frame_scores``;
* engine-output deviation (aggregated + newest scores, the RTTM inputs);

through the corners that exercise the ring's masked-select state machine:
warm-up from cold state, steady state, per-stream pause/resume, and a
mid-run slot reset. The test signal mixes speech-band tones, noise and
near-silent stretches (quiet log-mel bins are where reduced-precision
paths diverge — same rationale as the fast_fbank probe).

Run on the real TPU: ``python scripts/fring_fidelity.py [family ...]``.
Prints one JSON line per family.
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FAMILIES = {
    "ecapa": "tpu/ecapa",
    "resnet34": "tpu/resnet34",
    "titanet": "tpu/titanet",
    "xvect-sb": "tpu/xvect-sb",
}

BATCH = 8
DURATION, STEP, SR = 5.0, 0.5, 16000
WARMUP = int(DURATION / STEP)  # 10 hops
# hop schedule after warm-up: steady, pauses, reset, steady
PAUSE_HOPS = {12: np.array([True, False] * (BATCH // 2)),
              13: np.array([True, False, False, True] * (BATCH // 4)),
              14: np.array([True, False, False, True] * (BATCH // 4))}
RESET_AT, RESET_SLOT = 16, 3
TOTAL_HOPS = 22
# hops at which the embedding cosine is probed: mid warm-up, first full
# window, steady state, pause-resume hop, right after the slot reset, end
PROBE_HOPS = (5, WARMUP, 11, 15, RESET_AT + 1, TOTAL_HOPS - 1)


def _blocks_schedule(step_samples):
    """Speech-like blocks: per-stream tones + noise with near-silent
    stretches down to 3e-4 amplitude (exercises quiet log-mel bins)."""
    rng = np.random.default_rng(23)
    t_all = np.arange(TOTAL_HOPS * step_samples) / SR
    waves = []
    for i in range(BATCH):
        amp = 10.0 ** (-(i % 8) / 2.0)
        tone = np.sin(2 * np.pi * (120 + 37 * i) * t_all)
        tone += 0.5 * np.sin(2 * np.pi * (700 + 83 * i) * t_all)
        gate = (np.floor(t_all * 2) % 2 == (i % 2)).astype(np.float64)
        w = amp * gate * (tone + rng.normal(scale=0.3, size=t_all.shape))
        w += 1e-5 * rng.normal(size=t_all.shape)
        waves.append(w.astype(np.float32))
    full = np.stack(waves)  # (B, total samples)
    return [
        full[:, h * step_samples : (h + 1) * step_samples]
        for h in range(TOTAL_HOPS)
    ]


def _build(family_name, ring_on):
    from diart_tpu.models import EmbeddingModel, SegmentationModel
    from diart_tpu.parallel import MultiStreamEngine
    from diart_tpu.precision import Precision

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import _distinct_filterbanks

    seg = SegmentationModel.from_registry("tpu/pyannet", dtype="f32")
    emb = EmbeddingModel.from_registry(FAMILIES[family_name], dtype="bf16")
    _distinct_filterbanks(emb)
    policy = dataclasses.replace(Precision(), fbank_ring=ring_on)
    return MultiStreamEngine(
        segmentation=seg,
        embedding=emb,
        duration=DURATION,
        step=STEP,
        latency=STEP,
        sample_rate=SR,
        max_speakers=20,
        batch_size=BATCH,
        precision=policy,
    )


def _drive(engine, blocks):
    """Run the corner schedule; collect per-hop outputs and probe
    embeddings (cosine probes run BEFORE the step so they see the same
    pre-step state on both engines)."""
    state = engine.init_state()
    outs, embs = [], {}
    for h in range(TOTAL_HOPS):
        mask = PAUSE_HOPS.get(h)
        if h == RESET_AT:
            state = engine.reset_stream(state, RESET_SLOT)
        if h in PROBE_HOPS:
            seg_p, emb_p = engine.probe_frame_scores(
                state, blocks[h], audio_mask=mask
            )
            embs[h] = np.asarray(emb_p, np.float64)
        run = np.full((BATCH,), h + 1 >= WARMUP)
        state, out = engine.step(
            state, blocks[h], audio_mask=mask, run_mask=run
        )
        outs.append(
            (np.asarray(out.aggregated, np.float64),
             np.asarray(out.newest, np.float64))
        )
    return outs, embs


def _cosine(a, b):
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-30)


def main():
    import jax

    # Persistent compilation cache (bench.py's pattern): the remote TPU
    # compile service has high latency variance; never cache CPU-backend
    # executables (AOT for the exact host CPU).
    if jax.default_backend() != "cpu":
        cache_dir = Path(__file__).resolve().parent.parent / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    only = sys.argv[1:] or sorted(FAMILIES)
    for family in only:
        t0 = time.time()
        direct = _build(family, ring_on=False)
        ringed = _build(family, ring_on=True)
        assert direct._fring is None and ringed._fring is not None
        step_samples = direct.step_samples
        blocks = _blocks_schedule(step_samples)
        outs_d, embs_d = _drive(direct, blocks)
        outs_r, embs_r = _drive(ringed, blocks)

        agg_dev = max(
            float(np.max(np.abs(a_r - a_d)))
            for (a_r, _), (a_d, _) in zip(outs_r, outs_d)
        )
        new_dev = max(
            float(np.max(np.abs(n_r - n_d)))
            for (_, n_r), (_, n_d) in zip(outs_r, outs_d)
        )
        cos_by_hop = {
            h: round(float(_cosine(embs_r[h], embs_d[h]).min()), 6)
            for h in PROBE_HOPS
        }
        print(
            json.dumps(
                {
                    "family": family,
                    "batch": BATCH,
                    "geometry": f"{DURATION}s/{STEP}s",
                    "max_abs_dev_aggregated": round(agg_dev, 7),
                    "max_abs_dev_newest": round(new_dev, 7),
                    "emb_cos_ring_vs_direct_min_by_hop": cos_by_hop,
                    "emb_cos_min": min(cos_by_hop.values()),
                    "corners": "warmup+steady+pause/resume+slot-reset",
                    "seconds": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
