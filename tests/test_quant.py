"""Dynamic int8 trunk quantization (ops/quant.py + the int8_trunk switch).

The fast path is quality-affecting, so the tests pin (a) the op-level error
against the exact f32 convolution, (b) the model-level embedding fidelity
(cosine similarity through a full ResNet34 trunk), and (c) that the switch
defaults OFF and reaches every trunk conv when ON.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diart_tpu import precision
from diart_tpu.ops.quant import int8_conv, quantize_per_sample, quantize_weight


def test_quantize_per_sample_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(3, 17, 9, 5)) * rng.uniform(0.1, 10, (3, 1, 1, 1))).astype(
        np.float32
    )
    q, s = quantize_per_sample(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (3, 1, 1, 1)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - x)
    # worst-case rounding error is scale/2 per element
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_quantize_weight_per_channel():
    rng = np.random.default_rng(1)
    w = (rng.normal(size=(3, 3, 8, 16)) * rng.uniform(0.01, 5, (16,))).astype(
        np.float32
    )
    q, s = quantize_weight(jnp.asarray(w))
    assert q.dtype == jnp.int8 and s.shape == (16,)
    # every channel uses its own full int8 range
    assert (np.abs(np.asarray(q)).max(axis=(0, 1, 2)) == 127).all()
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - w)
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


@pytest.mark.parametrize("stride,pad", [(1, ((1, 1), (1, 1))), (2, ((0, 0), (0, 0)))])
def test_int8_conv_close_to_f32(stride, pad):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 20, 12, 16)).astype(np.float32)
    w = (rng.normal(size=(3, 3, 16, 32)) * 0.1).astype(np.float32)
    got = np.asarray(
        int8_conv(jnp.asarray(x), jnp.asarray(w), (stride, stride), list(pad))
    )
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (stride, stride), list(pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    # 7-effective-bit uniform quantization of both operands measures ~1%
    # relative RMS on a 144-long contraction of unit gaussians (the
    # per-sample max-abs scale spends ~2 bits on the ~4-sigma tail)
    rms = np.sqrt(np.mean((got - want) ** 2)) / (np.sqrt(np.mean(want**2)) + 1e-9)
    assert rms < 0.02, rms


def test_int8_conv_straight_through_gradient():
    """Training with the fast path on must work: the STE backward is the
    exact f32 convolution's VJP at the unquantized operands."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 8, 12)) * 0.1).astype(np.float32))

    def loss_int8(x, w):
        return jnp.sum(int8_conv(x, w, (1,), [(1, 1)]) ** 2) / 100

    def loss_f32(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1,), [(1, 1)], dimension_numbers=("NHC", "HIO", "NHC")
        )
        return jnp.sum(y**2) / 100

    gx_q, gw_q = jax.grad(loss_int8, argnums=(0, 1))(x, w)
    gx_f, gw_f = jax.grad(loss_f32, argnums=(0, 1))(x, w)
    # cotangents differ only through the (quantized) forward inside the
    # loss; the pullback itself is the exact f32 conv VJP
    np.testing.assert_allclose(np.asarray(gx_q), np.asarray(gx_f), rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(gw_q), np.asarray(gw_f), rtol=0.05, atol=0.02)
    assert np.isfinite(np.asarray(gx_q)).all() and np.abs(np.asarray(gx_q)).max() > 0


def _resnet(dim=32):
    from diart_tpu.models import EmbeddingModel

    emb = EmbeddingModel.from_registry(
        "tpu/resnet34", embedding_dim=dim, base_channels=8, init_samples=16000
    )
    emb.load()
    return emb


def test_int8_trunk_default_off():
    assert precision.Precision().int8_trunk is False
    assert precision.enabled("int8_trunk") is False
    assert precision.Precision().resolved()["int8_trunk"] is False


def test_resnet_trunk_int8_embedding_fidelity(monkeypatch):
    """Full ResNet34 trunk with every conv quantized: pooled embeddings must
    stay within clustering tolerance of the f32 path (cosine > 0.999 —
    δ_new's cosine-distance threshold is 1.0)."""
    emb = _resnet()
    rng = np.random.default_rng(3)
    wave = rng.normal(scale=0.2, size=(3, 1, 16000)).astype(np.float32)
    base = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))

    monkeypatch.setattr(precision, "enabled", lambda f: f == "int8_trunk")
    quant = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))

    assert not np.allclose(quant, base), "int8 path did not engage"
    cos = np.sum(quant * base, -1) / (
        np.linalg.norm(quant, axis=-1) * np.linalg.norm(base, axis=-1)
    )
    assert (cos > 0.999).all(), cos
    rel = np.linalg.norm(quant - base, axis=-1) / np.linalg.norm(base, axis=-1)
    assert (rel < 0.05).all(), rel


def test_titanet_trunk_int8_embedding_fidelity(monkeypatch):
    """TitaNet's pointwise/residual 1x1 convs quantized: same embedding
    fidelity bar as ResNet34."""
    from diart_tpu.models import EmbeddingModel

    emb = EmbeddingModel.from_registry(
        "tpu/titanet", embedding_dim=32, channels=64, init_samples=16000
    )
    emb.load()
    rng = np.random.default_rng(5)
    wave = rng.normal(scale=0.2, size=(3, 1, 16000)).astype(np.float32)
    base = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))

    monkeypatch.setattr(precision, "enabled", lambda f: f == "int8_trunk")
    quant = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))

    assert not np.allclose(quant, base), "int8 path did not engage"
    cos = np.sum(quant * base, -1) / (
        np.linalg.norm(quant, axis=-1) * np.linalg.norm(base, axis=-1)
    )
    assert (cos > 0.999).all(), cos


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("tpu/ecapa", dict(embedding_dim=32, channels=32)),
        ("tpu/xvector", dict(embedding_dim=32)),
        (
            "tpu/xvect-sb",
            dict(
                embedding_dim=32,
                tdnn_specs=((5, 1, 16), (3, 2, 16), (3, 3, 16), (1, 1, 16), (1, 1, 48)),
            ),
        ),
    ],
)
def test_tdnn_trunk_int8_embedding_fidelity(monkeypatch, name, kwargs):
    """ECAPA and speechbrain x-vector TDNN trunks (incl. dilated + biased
    convs through the shared QuantizableConv): same fidelity bar."""
    from diart_tpu.models import EmbeddingModel

    emb = EmbeddingModel.from_registry(name, init_samples=16000, **kwargs)
    emb.load()
    rng = np.random.default_rng(7)
    wave = rng.normal(scale=0.2, size=(3, 1, 16000)).astype(np.float32)
    base = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))

    monkeypatch.setattr(precision, "enabled", lambda f: f == "int8_trunk")
    quant = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))

    assert not np.allclose(quant, base), "int8 path did not engage"
    cos = np.sum(quant * base, -1) / (
        np.linalg.norm(quant, axis=-1) * np.linalg.norm(base, axis=-1)
    )
    assert (cos > 0.999).all(), cos


def test_int8_batch_independence(monkeypatch):
    """Serving invariant: a stream's embedding must not depend on which
    other streams share its batch. Per-SAMPLE activation scales guarantee
    it (a per-tensor scale would couple streams through the batch max)."""
    emb = _resnet(dim=16)
    rng = np.random.default_rng(8)
    quiet = rng.normal(scale=0.01, size=(1, 1, 16000)).astype(np.float32)
    loud = rng.normal(scale=5.0, size=(1, 1, 16000)).astype(np.float32)

    monkeypatch.setattr(precision, "enabled", lambda f: f == "int8_trunk")
    alone = np.asarray(emb.module.apply(emb.params, jnp.asarray(quiet)))
    batched = np.asarray(
        emb.module.apply(
            emb.params, jnp.asarray(np.concatenate([quiet, loud], axis=0))
        )
    )
    np.testing.assert_allclose(batched[:1], alone, atol=1e-5)


def test_int8_policy_scoped_engagement():
    """Precision.use scoping (not just env/monkeypatch) flips the path."""
    emb = _resnet(dim=16)
    rng = np.random.default_rng(4)
    wave = rng.normal(scale=0.2, size=(1, 1, 16000)).astype(np.float32)
    base = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))
    with precision.use(
        precision.Precision(int8_trunk=True), force=True
    ):
        quant = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))
    assert not np.allclose(quant, base)
    with precision.use(precision.Precision(), force=True):
        again = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave)))
    np.testing.assert_allclose(again, base, atol=1e-6)


def test_int8_trunk_through_engine():
    """Serving invariant at the ENGINE level: enabling the int8 trunk on a
    `MultiStreamEngine` leaves the emitted diarization (near-)unchanged —
    same active centroid slots, centroid cosine > 0.999, aggregated scores
    within a small tolerance of the f32 engine's. The segmentation arm is
    untouched by the switch, so divergence can only enter through the
    embedding->clustering path; this pins that it stays inside the
    clustering margins end-to-end (reference decision thresholds:
    /root/reference/src/diart/blocks/diarization.py:21-86)."""
    from diart_tpu.models import EmbeddingModel, SegmentationModel
    from diart_tpu.parallel import MultiStreamEngine

    seg = SegmentationModel.from_registry(
        "tpu/pyannet",
        lstm_hidden=16,
        lstm_layers=1,
        linear_dims=(16,),
        init_samples=32000,
    )
    emb = EmbeddingModel.from_registry(
        "tpu/xvector", embedding_dim=32, init_samples=32000
    )
    kw = dict(
        segmentation=seg,
        embedding=emb,
        duration=2.0,
        step=0.5,
        latency=0.5,
        sample_rate=16000,
        tau_active=0.2,  # low gate so random-init scores activate speakers
        max_speakers=4,
        batch_size=2,
    )
    base = MultiStreamEngine(**kw, precision=precision.Precision())
    quant = MultiStreamEngine(
        **kw, precision=precision.Precision(int8_trunk=True)
    )

    rng = np.random.default_rng(3)
    sb, sq = base.init_state(), quant.init_state()
    ob = oq = None
    for _ in range(8):
        blk = rng.normal(scale=0.2, size=(2, base.step_samples)).astype(
            np.float32
        )
        sb, ob = base.step(sb, blk)
        sq, oq = quant.step(sq, blk)

    cb, cq = np.asarray(sb.centers), np.asarray(sq.centers)
    active = np.asarray(sb.center_active).astype(bool)
    assert active.any(), "no speakers activated; the test exercised nothing"
    assert np.isfinite(cq).all()
    # the int8 path engaged (centroid sums carry quantization noise)...
    assert not np.allclose(cq, cb)
    # ...but stayed inside the clustering margins:
    np.testing.assert_array_equal(np.asarray(sq.center_active), active)
    dot = (cb * cq).sum(-1)
    norms = np.linalg.norm(cb, axis=-1) * np.linalg.norm(cq, axis=-1)
    cos = np.where(active, dot / np.maximum(norms, 1e-9), 1.0)
    assert (cos > 0.999).all(), cos
    np.testing.assert_allclose(
        np.asarray(oq.aggregated), np.asarray(ob.aggregated), atol=0.02
    )
