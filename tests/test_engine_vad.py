"""VAD mode of the fused engine: parity with the VoiceActivityDetection
pipeline path."""

import numpy as np

from diart_tpu import VoiceActivityDetection, VoiceActivityDetectionConfig
from diart_tpu.core import SlidingWindow, SlidingWindowFeature
from diart_tpu.metrics import DetectionErrorRate
from diart_tpu.parallel import MultiStreamEngine, MultiStreamSession
from diart_tpu.runtime.sinks import PredictionAccumulator

from fakes import SAMPLE_RATE, Turn, fake_segmentation, synth_audio, turns_to_annotation

TURNS = [Turn(0.0, 2.5, 0), Turn(3.5, 6.0, 1), Turn(7.0, 9.0, 2)]
TOTAL = 10.0
DURATION, STEP, LATENCY, TAU = 2.0, 0.5, 1.0, 0.6


def test_vad_engine_matches_pipeline():
    audio = synth_audio(TURNS, TOTAL, seed=5)

    # pipeline path
    config = VoiceActivityDetectionConfig(
        segmentation=fake_segmentation(),
        duration=DURATION, step=STEP, latency=LATENCY,
        tau_active=TAU, sample_rate=SAMPLE_RATE,
    )
    pipe = VoiceActivityDetection(config)
    chunk_s, step_s = int(DURATION * SAMPLE_RATE), int(STEP * SAMPLE_RATE)
    acc_pipe = PredictionAccumulator("u")
    res = 1.0 / SAMPLE_RATE
    for start in range(0, audio.shape[1] - chunk_s + 1, step_s):
        sw = SlidingWindow(start=start / SAMPLE_RATE, duration=res, step=res)
        out = pipe([SlidingWindowFeature(audio[0, start : start + chunk_s, None], sw)])
        acc_pipe.on_next(out[0][0])

    # engine path (VAD = no embedding model)
    engine = MultiStreamEngine(
        segmentation=fake_segmentation(),
        embedding=None,
        duration=DURATION, step=STEP, latency=LATENCY,
        sample_rate=SAMPLE_RATE, batch_size=1,
    )
    assert engine.is_vad
    session = MultiStreamSession(engine, tau_active=TAU, collect_audio=False)
    acc_eng = PredictionAccumulator("u")
    for blk in range(int(TOTAL * SAMPLE_RATE) // step_s):
        outs = session.push(audio[:, blk * step_s : (blk + 1) * step_s])
        if outs[0] is not None:
            # VAD engine emits per-speaker binarized turns on one channel;
            # match pipeline semantics by relabeling to "speech"
            ann = outs[0][0]
            relabeled = ann.rename_labels({l: "speech" for l in ann.labels()})
            acc_eng.on_next(relabeled)

    det = DetectionErrorRate()
    pipe_pred = acc_pipe.get_prediction()
    eng_pred = acc_eng.get_prediction()
    assert det(pipe_pred, eng_pred) < 0.02

    # and both are accurate vs ground truth
    for pred in (pipe_pred, eng_pred):
        err = DetectionErrorRate()(turns_to_annotation(TURNS), pred)
        assert err < 0.15, err
