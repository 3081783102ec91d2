"""Incremental mel frontend (engine ``fbank_ring`` fast path).

Every log-mel stage up to the window-level normalization is frame-local, so
the embedding's raw per-frame log-mel features live in a rolling
CHRONOLOGICAL device ring across hops (``parallel/engine.py:_fring_advance``
+ ``models/fbank.py`` "Incremental mel frontends"); each step computes only
the incoming block's frames plus the window-edge frames, and the model's
``trunk_from_raw_fbank`` consumes the assembled tensor.

These tests pin (a) when the path engages (mel embeddings only — the
SincNet conv-output ring variant was measured slower than the direct
convolution on v5e and removed, PERF.md "conv_ring"), and (b) engine-output
parity with the direct full-window formulation — including per-stream
pause/resume and mid-run slot resets, the cases that exercise the masked
ring freeze. The cached stage is bit-identical frame math; only the window
normalization re-runs, so round-off-level divergence is the only allowed
difference.
"""

import numpy as np
import pytest

from diart_tpu.models import EmbeddingModel, SegmentationModel
from diart_tpu.parallel import MultiStreamEngine

SAMPLE_RATE = 16000
DURATION, STEP = 2.0, 0.5
CHUNK = int(DURATION * SAMPLE_RATE)


def _seg():
    return SegmentationModel.from_registry(
        "tpu/pyannet",
        lstm_hidden=16,
        lstm_layers=1,
        linear_dims=(16,),
        init_samples=CHUNK,
    )


def _ecapa():
    return EmbeddingModel.from_registry(
        "tpu/ecapa", embedding_dim=32, channels=32, init_samples=CHUNK
    )


def _engine(seg, emb, **kw):
    return MultiStreamEngine(
        segmentation=seg,
        embedding=emb,
        duration=DURATION,
        step=STEP,
        latency=STEP,
        sample_rate=SAMPLE_RATE,
        max_speakers=4,
        batch_size=3,
        **kw,
    )


def _drive(engine, steps=7, seed=0, masks=None, reset_at=None):
    rng = np.random.default_rng(seed)
    state = engine.init_state()
    outs = []
    for t in range(steps):
        blocks = rng.normal(scale=0.1, size=(3, engine.step_samples)).astype(
            np.float32
        )
        if reset_at is not None and t == reset_at:
            state = engine.reset_stream(state, 1)
        mask = None if masks is None else masks[t]
        state, out = engine.step(state, blocks, audio_mask=mask)
        outs.append((np.asarray(out.aggregated), np.asarray(out.newest)))
    return state, outs


def _assert_close(outs_a, outs_b, atol):
    for (agg_a, new_a), (agg_b, new_b) in zip(outs_a, outs_b):
        np.testing.assert_allclose(agg_a, agg_b, atol=atol, rtol=0)
        np.testing.assert_allclose(new_a, new_b, atol=atol, rtol=0)


def test_fbank_ring_engages(monkeypatch):
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "1")
    engine = _engine(_seg(), _ecapa())
    spec = engine._fring
    assert spec is not None
    assert spec.kind == "speechbrain" and spec.edge == 2
    # 2 s / 0.5 s at hop 160: 50 frames/block, 4 blocks/window
    assert (spec.fpb, spec.nb) == (50, 4)
    st = engine.init_state().audio
    assert set(st) == {"window", "ring", "head", "tail"}
    assert st["ring"].shape == (3, 4 * 50, spec.num_mels)
    # not-yet-streamed ring frames hold the zero-signal constant, not zero
    assert np.allclose(np.asarray(st["ring"][0, 0]), -100.0)
    # the waveform window (the segmentation side) is stored alongside
    assert st["window"].ndim in (2, 3)


def test_fbank_ring_default_on():
    """Default ON since round 4 (on-chip A/B won on every mel family)."""
    engine = _engine(_seg(), _ecapa())
    assert engine._fring is not None


def test_fbank_ring_env_opt_out(monkeypatch):
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "0")
    engine = _engine(_seg(), _ecapa())
    assert engine._fring is None


def test_fbank_ring_spec_rejects_multi_block_edges():
    """Geometries whose edge context spans more than one step block have
    no single-block head/tail decomposition — the spec must return None
    (direct-path fallback) instead of crashing at trace time (ADVICE r3:
    step=320 with win=400 passes the win-hop guard but needs
    tail_len=400>320 for the padded kinds)."""
    from diart_tpu.models.fbank import fbank_ring_spec

    for kind in ("speechbrain", "nemo"):
        assert fbank_ring_spec(kind, 80, 16000, 3200, 320) is None
    # kaldi (unpadded, tail_conv=320) still fits a single block there
    spec = fbank_ring_spec("kaldi", 80, 16000, 3200, 320)
    assert spec is not None and spec.tail_len <= 320
    # and the production geometry qualifies for every kind
    for kind in ("kaldi", "speechbrain", "nemo"):
        s = fbank_ring_spec(kind, 80, 16000, 80000, 8000)
        assert s is not None and max(s.head_len, s.tail_len) <= 8000


def test_fbank_ring_sinc_embedding_disengages(monkeypatch):
    """A SincNet embedding has no mel frontend to cache — the path stays
    off (the sinc conv-output ring was measured slower than the direct
    convolution and removed; PERF.md)."""
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "1")
    emb = EmbeddingModel.from_registry(
        "tpu/xvector", embedding_dim=64, init_samples=CHUNK
    )
    engine = _engine(_seg(), emb)
    assert engine._fring is None
    # the plain waveform window remains the audio state
    assert not isinstance(engine.init_state().audio, dict)


def test_fbank_ring_vad_disengages(monkeypatch):
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "1")
    engine = MultiStreamEngine(
        segmentation=_seg(),
        embedding=None,
        duration=DURATION,
        step=STEP,
        latency=STEP,
        sample_rate=SAMPLE_RATE,
        batch_size=3,
    )
    assert engine._fring is None


MEL_FAMILIES = [
    ("tpu/ecapa", dict(embedding_dim=32, channels=32)),
    ("tpu/resnet34", dict(embedding_dim=32, base_channels=8)),
    ("tpu/titanet", dict(embedding_dim=32, channels=32)),
    (
        "tpu/xvect-sb",
        dict(
            embedding_dim=32,
            tdnn_specs=(
                (5, 1, 16),
                (3, 2, 16),
                (3, 3, 16),
                (1, 1, 16),
                (1, 1, 48),
            ),
        ),
    ),
]


@pytest.mark.parametrize("family,kwargs", MEL_FAMILIES)
def test_fbank_ring_matches_direct(monkeypatch, family, kwargs):
    """Every mel family through the incremental frame ring reproduces the
    direct full-window frontend, including per-stream pauses (a paused
    stream's ring/head/tail freeze wholesale via masked select)."""
    seg = _seg()
    emb = EmbeddingModel.from_registry(family, init_samples=CHUNK, **kwargs)
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "0")
    direct = _engine(seg, emb)
    assert direct._fring is None
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "1")
    ringed = _engine(seg, emb)
    assert ringed._fring is not None

    masks = [
        np.array([True, True, True]),
        np.array([True, False, True]),
        np.array([True, True, False]),
        np.array([True, True, True]),
        np.array([False, True, True]),
        np.array([True, True, True]),
        np.array([True, True, True]),
    ]
    _, outs_d = _drive(direct, steps=len(masks), masks=masks)
    _, outs_r = _drive(ringed, steps=len(masks), masks=masks)
    _assert_close(outs_r, outs_d, atol=5e-5)


def test_fbank_ring_long_pause(monkeypatch):
    """Streams pausing for several consecutive hops (longer than the edge
    margin) resume with an exactly aligned window."""
    masks = [
        np.array([True, True, True]),
        np.array([True, False, True]),
        np.array([True, False, False]),
        np.array([True, False, False]),
        np.array([True, True, False]),
        np.array([True, True, True]),
        np.array([False, True, True]),
        np.array([True, True, True]),
        np.array([True, True, True]),
    ]
    seg, emb = _seg(), _ecapa()
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "0")
    direct = _engine(seg, emb)
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "1")
    ringed = _engine(seg, emb)
    assert ringed._fring is not None

    _, outs_d = _drive(direct, steps=len(masks), masks=masks)
    _, outs_r = _drive(ringed, steps=len(masks), masks=masks)
    _assert_close(outs_r, outs_d, atol=5e-5)


def test_fbank_ring_reset_stream(monkeypatch):
    """A mid-run slot reset re-warms that stream from the zero-signal fill,
    identically to the direct path's zero-filled window."""
    seg, emb = _seg(), _ecapa()
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "0")
    direct = _engine(seg, emb)
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "1")
    ringed = _engine(seg, emb)
    assert ringed._fring is not None

    _, outs_d = _drive(direct, steps=9, reset_at=4)
    _, outs_r = _drive(ringed, steps=9, reset_at=4)
    _assert_close(outs_r, outs_d, atol=5e-5)


def test_fbank_ring_sharded_mesh(monkeypatch):
    """The dict-valued state shards along the streams axis (the engine's
    prefix sharding covers every leaf of the ring pytree) and a sharded
    step reproduces the single-device outputs."""
    import jax
    from jax.sharding import Mesh

    monkeypatch.setenv("DIART_TPU_FBANK_RING", "1")
    seg, emb = _seg(), _ecapa()
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = Mesh(np.array(devices[:2]), ("streams",))

    def build(m):
        return MultiStreamEngine(
            segmentation=seg,
            embedding=emb,
            duration=DURATION,
            step=STEP,
            latency=STEP,
            sample_rate=SAMPLE_RATE,
            max_speakers=4,
            batch_size=4,
            mesh=m,
        )

    single = build(None)
    sharded = build(mesh)
    assert sharded._fring is not None
    rng = np.random.default_rng(7)
    st_s, st_m = single.init_state(), sharded.init_state()
    for _ in range(6):
        blocks = rng.normal(
            scale=0.1, size=(4, single.step_samples)
        ).astype(np.float32)
        st_s, out_s = single.step(st_s, blocks)
        st_m, out_m = sharded.step(st_m, blocks)
    np.testing.assert_allclose(
        np.asarray(out_m.aggregated),
        np.asarray(out_s.aggregated),
        atol=5e-5,
        rtol=0,
    )


def test_fbank_ring_session_save_restore(monkeypatch, tmp_path):
    """The dict-valued audio state round-trips through session save/restore
    and the restored session continues bit-identically."""
    monkeypatch.setenv("DIART_TPU_FBANK_RING", "1")
    from diart_tpu.parallel.session import MultiStreamSession

    engine = _engine(_seg(), _ecapa())
    assert engine._fring is not None
    sess = MultiStreamSession(engine, uris=["a", "b", "c"])
    rng = np.random.default_rng(5)
    mk = lambda: rng.normal(scale=0.1, size=(3, engine.step_samples)).astype(
        np.float32
    )
    for _ in range(5):
        sess.push(mk())
    sess.save(tmp_path / "ckpt")

    restored = MultiStreamSession(engine, uris=["a", "b", "c"])
    restored.restore(tmp_path / "ckpt")
    nxt = mk()
    out_a = sess.push(nxt.copy())
    out_b = restored.push(nxt.copy())
    for oa, ob in zip(out_a, out_b):
        assert (oa is None) == (ob is None)
        if oa is not None:
            # Annotation compares by identity; the serialized segments are
            # the value contract
            assert str(oa[0]) == str(ob[0])
