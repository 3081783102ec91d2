"""Phase-major audio ring (engine + models/sincnet.py ``phased``).

When every frontend is a stride-s SincNet, the engine stores its rolling
waveform window directly in the phase-decomposed layout the SincNet
convolution consumes — (B, s, samples/s), sample i at [b, i % s, i // s] —
so the per-step relayout of the full window (transpose + reshape, ~0.46
ms/step at batch 256 on v5e) collapses to reshaping the incoming block.
Pure layout change: these tests pin (a) when the path engages, and (b)
that its outputs match the flat-ring formulation on identical streams.
"""

import numpy as np
import pytest

from diart_tpu.models import EmbeddingModel, SegmentationModel
from diart_tpu.parallel import MultiStreamEngine

SAMPLE_RATE = 16000
DURATION, STEP = 2.0, 0.5
CHUNK = int(DURATION * SAMPLE_RATE)


def _models():
    seg = SegmentationModel.from_registry(
        "tpu/pyannet",
        lstm_hidden=16,
        lstm_layers=1,
        linear_dims=(16,),
        init_samples=CHUNK,
    )
    emb = EmbeddingModel.from_registry(
        "tpu/xvector", embedding_dim=64, init_samples=CHUNK
    )
    return seg, emb


def _engine(seg, emb, **kw):
    return MultiStreamEngine(
        segmentation=seg,
        embedding=emb,
        duration=DURATION,
        step=STEP,
        latency=STEP,
        sample_rate=SAMPLE_RATE,
        max_speakers=4,
        batch_size=2,
        **kw,
    )


def _drive(engine, steps=7, seed=0):
    rng = np.random.default_rng(seed)
    state = engine.init_state()
    outs = []
    for _ in range(steps):
        blocks = rng.normal(scale=0.1, size=(2, engine.step_samples)).astype(
            np.float32
        )
        state, out = engine.step(state, blocks)
        outs.append(
            (np.asarray(out.aggregated), np.asarray(out.newest))
        )
    return state, outs


def test_phased_engages_for_sincnet_models():
    seg, emb = _models()
    engine = _engine(seg, emb)
    assert engine._phase == 10  # SincConv default stride
    assert engine.init_state().audio.shape == (2, 10, CHUNK // 10)


def test_phased_off_via_env(monkeypatch):
    monkeypatch.setenv("DIART_TPU_PHASED_RING", "0")
    seg, emb = _models()
    engine = _engine(seg, emb)
    assert engine._phase == 0
    assert engine.init_state().audio.shape == (2, CHUNK)


def test_phased_off_for_mel_frontends(monkeypatch):
    """Mel-fbank families pad/frame on their own grid — no phase layout
    when the embedding consumes the waveform window (fbank_ring off)."""
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "0")
    seg, _ = _models()
    emb = EmbeddingModel.from_registry(
        "tpu/ecapa", embedding_dim=32, channels=32, init_samples=CHUNK
    )
    engine = _engine(seg, emb)
    assert engine._phase == 0


def test_phased_on_for_mel_frontends_with_fbank_ring():
    """Default config: the mel embedding runs off the incremental frame
    ring and never sees the waveform window, so only the SincNet
    segmentation constrains the window layout — phase-major engages."""
    seg, _ = _models()
    emb = EmbeddingModel.from_registry(
        "tpu/ecapa", embedding_dim=32, channels=32, init_samples=CHUNK
    )
    engine = _engine(seg, emb)
    assert engine._fring is not None
    assert engine._phase == 10


def test_phased_matches_flat(monkeypatch):
    """Same params, same audio: the phase-major ring reproduces the flat
    ring's outputs (identical contraction; only reduction/layout order
    differs, so f32 round-off is the only allowed divergence)."""
    seg, emb = _models()
    phased = _engine(seg, emb)
    assert phased._phase == 10
    monkeypatch.setenv("DIART_TPU_PHASED_RING", "0")
    flat = _engine(seg, emb)
    assert flat._phase == 0

    _, outs_p = _drive(phased)
    _, outs_f = _drive(flat)
    for (agg_p, new_p), (agg_f, new_f) in zip(outs_p, outs_f):
        np.testing.assert_allclose(agg_p, agg_f, atol=2e-5, rtol=0)
        np.testing.assert_allclose(new_p, new_f, atol=2e-5, rtol=0)


def test_phased_vad_matches_flat(monkeypatch):
    """VAD mode (segmentation only) takes the phased path too."""
    seg, _ = _models()
    phased = MultiStreamEngine(
        segmentation=seg,
        embedding=None,
        duration=DURATION,
        step=STEP,
        latency=STEP,
        sample_rate=SAMPLE_RATE,
        batch_size=2,
    )
    assert phased._phase == 10
    monkeypatch.setenv("DIART_TPU_PHASED_RING", "0")
    flat = MultiStreamEngine(
        segmentation=seg,
        embedding=None,
        duration=DURATION,
        step=STEP,
        latency=STEP,
        sample_rate=SAMPLE_RATE,
        batch_size=2,
    )
    assert flat._phase == 0
    _, outs_p = _drive(phased)
    _, outs_f = _drive(flat)
    for (agg_p, _), (agg_f, _) in zip(outs_p, outs_f):
        np.testing.assert_allclose(agg_p, agg_f, atol=2e-5, rtol=0)
