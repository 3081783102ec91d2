"""Incremental conv-output ring (engine ``conv_ring`` fast path).

The SincNet stage-1 convolution is linear and the waveform instance-norm is
a per-stream affine, so conv(norm(window)) decomposes into a per-frontend
device ring of raw conv outputs (updated with one small block conv per hop)
plus per-stream affine scalars applied at read time
(``parallel/engine.py:_convring_advance`` + ``ops/pallas_convring.py``).

These tests pin (a) when the path engages, (b) engine-output parity with
the direct full-window formulation — including per-stream pause/resume and
mid-run slot resets, the cases that exercise the per-stream rotation — and
(c) the rotated-read kernel's interpret-mode parity with its portable
oracle. Numerics: the decomposition changes fp association (block-wise
conv, moment sums, affine-after-conv), so round-off-level divergence is
the only allowed difference (same tolerance class as the phase-decomposed
convolution, tests/test_phased_ring.py).
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


def test_conv_ring_engages(monkeypatch):
    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    seg, emb = _models()
    engine = _engine(seg, emb)
    assert engine._convring is not None and len(engine._convring) == 2
    spec = engine._convring[0]
    # 2 s / 0.5 s, stride 10, kernel 251
    assert (spec.fpb, spec.nb, spec.trim, spec.tail) == (800, 4, 25, 250)
    assert spec.pooled == ((CHUNK - 251) // 10 + 1) // 3
    st = engine.init_state().audio
    assert set(st) == {"rings", "heads", "sums", "tail", "blocks"}
    # time-major (frames, channels), +1 trash slot
    assert st["rings"][0].shape == (3, (4 + 1) * 800, 80)
    assert st["sums"].shape == (3, 5, 2)
    assert st["tail"].shape == (3, 250)


def test_conv_ring_default_off():
    seg, emb = _models()
    engine = _engine(seg, emb)
    assert engine._convring is None


def test_conv_ring_mel_embedding_engages(monkeypatch):
    """A mel embedding joins via the incremental log-mel frame ring
    (models/fbank.py FbankRingSpec) alongside the sinc segmentation."""
    from diart_tpu.models.fbank import FbankRingSpec

    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    seg, _ = _models()
    emb = EmbeddingModel.from_registry(
        "tpu/ecapa", embedding_dim=32, channels=32, init_samples=CHUNK
    )
    engine = _engine(seg, emb)
    assert engine._convring is not None
    assert isinstance(engine._convring[1], FbankRingSpec)
    spec = engine._convring[1]
    assert spec.kind == "speechbrain" and spec.edge == 2
    st = engine.init_state().audio
    # empty mel slots hold the zero-signal constant, not zero
    assert np.allclose(np.asarray(st["rings"][1][0, 0]), -100.0)


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
def test_conv_ring_mel_matches_direct(monkeypatch, family, kwargs):
    """Every mel family through the incremental frame ring reproduces the
    direct full-window frontend, including per-stream pauses (the cached
    stage is bit-identical; only the window normalization re-runs)."""
    seg, _ = _models()
    emb = EmbeddingModel.from_registry(
        family, init_samples=CHUNK, **kwargs
    )
    direct = _engine(seg, emb)
    assert direct._convring is None
    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    ringed = _engine(seg, emb)
    assert ringed._convring is not None

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


def test_conv_ring_matches_direct(monkeypatch):
    seg, emb = _models()
    direct = _engine(seg, emb)
    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    ringed = _engine(seg, emb)
    assert ringed._convring is not None

    _, outs_d = _drive(direct, steps=9)
    _, outs_r = _drive(ringed, steps=9)
    _assert_close(outs_r, outs_d, atol=5e-5)


def test_conv_ring_per_stream_pause(monkeypatch):
    """Streams pausing and resuming at different ticks exercise the
    per-stream rotation: each stream's window must stay frozen while its
    audio_mask is False and resume seamlessly."""
    masks = [
        np.array([True, True, True]),
        np.array([True, False, True]),
        np.array([True, False, False]),
        np.array([True, True, False]),
        np.array([True, True, True]),
        np.array([False, True, True]),
        np.array([True, True, True]),
        np.array([True, True, True]),
    ]
    seg, emb = _models()
    direct = _engine(seg, emb)
    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    ringed = _engine(seg, emb)
    assert ringed._convring is not None

    _, outs_d = _drive(direct, steps=len(masks), masks=masks)
    _, outs_r = _drive(ringed, steps=len(masks), masks=masks)
    _assert_close(outs_r, outs_d, atol=5e-5)


def test_conv_ring_reset_stream(monkeypatch):
    """A mid-run slot reset re-warms that stream from zeros, identically to
    the direct path (the recycled stream's rotation restarts at 0 while the
    others keep theirs)."""
    seg, emb = _models()
    direct = _engine(seg, emb)
    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    ringed = _engine(seg, emb)
    assert ringed._convring is not None

    _, outs_d = _drive(direct, steps=9, reset_at=4)
    _, outs_r = _drive(ringed, steps=9, reset_at=4)
    _assert_close(outs_r, outs_d, atol=5e-5)


def test_conv_ring_vad(monkeypatch):
    def make(env):
        seg, _ = _models()
        return MultiStreamEngine(
            segmentation=seg,
            embedding=None,
            duration=DURATION,
            step=STEP,
            latency=STEP,
            sample_rate=SAMPLE_RATE,
            batch_size=3,
        )

    direct = make(False)
    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    ringed = make(True)
    assert ringed._convring is not None and len(ringed._convring) == 1

    _, outs_d = _drive(direct)
    _, outs_r = _drive(ringed)
    for (agg_d, _), (agg_r, _) in zip(outs_d, outs_r):
        np.testing.assert_allclose(agg_r, agg_d, atol=5e-5, rtol=0)


def test_rotated_pooled_kernel_interpret_parity():
    """The Pallas kernel's logic (interpret mode) against the portable
    oracle, at several rotations including 0 and near-wrap."""
    import jax.numpy as jnp

    from diart_tpu.ops.pallas_convring import (
        rotated_pooled,
        rotated_pooled_reference,
    )

    rng = np.random.default_rng(3)
    B, C, NB, FPB = 4, 16, 4, 48
    W = NB * FPB
    trim = 7
    P = (W - trim) // 3
    ring = rng.normal(size=(B, W + FPB, C)).astype(np.float32)
    off = np.array([0, 1, FPB * (NB - 1), W - 1], np.int32)
    shift = ((W - off) % W).astype(np.int32)
    a = rng.normal(size=B).astype(np.float32)
    c = rng.normal(size=B).astype(np.float32)
    ts = rng.normal(size=C).astype(np.float32)
    kw = dict(window_frames=W, trim=trim, pooled_frames=P)
    ref = rotated_pooled_reference(
        jnp.array(ring), jnp.array(shift), jnp.array(a), jnp.array(c),
        jnp.array(ts), **kw,
    )
    ker = rotated_pooled(
        jnp.array(ring), jnp.array(shift), jnp.array(a), jnp.array(c),
        jnp.array(ts), interpret=True, **kw,
    )
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-6)


def test_conv_ring_sharded_mesh(monkeypatch):
    """The dict-valued state shards along the streams axis (the engine's
    prefix sharding covers every leaf of the conv-ring pytree) and a
    sharded step reproduces the single-device outputs."""
    import jax
    from jax.sharding import Mesh

    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    seg, emb = _models()
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
    assert sharded._convring is not None
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


def test_conv_ring_session_save_restore(monkeypatch, tmp_path):
    """The dict-valued audio state round-trips through session save/restore
    and the restored session continues bit-identically."""
    monkeypatch.setenv("DIART_TPU_CONV_RING", "1")
    from diart_tpu.parallel.session import MultiStreamSession

    seg, emb = _models()
    engine = _engine(seg, emb)
    assert engine._convring is not None
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
