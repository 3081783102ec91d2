"""Parity tests for the fused channel-attention statistics Pallas kernel.

The kernel (ops/pallas_attn_stats.py) replaces the ECAPA/TitaNet head's
``softmax(att2(hidden))`` + three weighted-moment contractions on TPU; these
tests pin it (interpreter mode on the CPU backend) against the unfused
oracle and against the full ``attentive_stats_pool`` path, so the TPU fast
path provably computes the same embeddings the checkpoint-fidelity tests
certify.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diart_tpu.ops.pallas_attn_stats import (
    attentive_stats_reference,
    fused_attentive_stats,
)


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize(
    "batch,time,channels,bottleneck,speakers",
    [
        (8, 501, 1536, 128, 4),  # the ECAPA engine's exact geometry
        (3, 37, 300, 64, 1),  # odd batch -> single-row cells, tail tile
        (2, 50, 128, 32, 6),  # single channel tile, sub-lane bottleneck
    ],
)
def test_kernel_matches_reference(batch, time, channels, bottleneck, speakers):
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    x = _rand(keys[0], batch, time, channels)
    hidden = jnp.tanh(_rand(keys[1], batch, time, bottleneck))
    w2 = _rand(keys[2], bottleneck, channels) * 0.2
    b2 = _rand(keys[3], channels) * 0.1
    weights = jax.nn.sigmoid(_rand(keys[4], batch, speakers, time))

    den, s1, s2 = fused_attentive_stats(x, hidden, w2, b2, weights, interpret=True)
    rd, r1, r2 = attentive_stats_reference(x, hidden, w2, b2, weights)
    np.testing.assert_allclose(den, rd, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s1, r1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s2, r2, rtol=1e-5, atol=1e-4)


def test_kernel_bf16_input_close_to_f32():
    keys = jax.random.split(jax.random.PRNGKey(1), 5)
    x = _rand(keys[0], 4, 64, 256)
    hidden = jnp.tanh(_rand(keys[1], 4, 64, 128))
    w2 = _rand(keys[2], 128, 256) * 0.2
    b2 = _rand(keys[3], 256) * 0.1
    weights = jax.nn.sigmoid(_rand(keys[4], 4, 2, 64))

    den, s1, s2 = fused_attentive_stats(
        x.astype(jnp.bfloat16), hidden, w2, b2, weights, interpret=True
    )
    rd, r1, r2 = attentive_stats_reference(x, hidden, w2, b2, weights)
    assert s1.dtype == jnp.float32  # f32 accumulation regardless of input
    np.testing.assert_allclose(den, rd, rtol=1e-5, atol=1e-5)  # alpha is f32
    np.testing.assert_allclose(s1, r1, rtol=2e-2, atol=2e-1)
    np.testing.assert_allclose(s2, r2, rtol=2e-2, atol=5e-1)


@pytest.mark.parametrize("family", ["ecapa", "titanet"])
def test_fused_pool_matches_standard_head(family, monkeypatch):
    """Full model head: attentive_stats_pool with the fused kernel forced on
    == the portable einsum path, on the same parameters."""
    if family == "ecapa":
        from diart_tpu.models.ecapa import EcapaTDNN

        model = EcapaTDNN(channels=64, embedding_dim=32)
    else:
        from diart_tpu.models.titanet import TitaNet

        model = TitaNet(channels=64, embedding_dim=32, repeat=1)
    wave = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16000), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), wave)
    frames = model.apply(params, wave, method="trunk")
    weights = jax.nn.sigmoid(
        jax.random.normal(jax.random.PRNGKey(4), (2, 3, 117), jnp.float32)
    )

    standard = model.apply(params, frames, weights, method="head")

    from diart_tpu import precision

    monkeypatch.setattr(precision, "enabled", lambda f: f == "pallas_attn")
    fused = model.apply(params, frames, weights, method="head")
    assert fused.shape == standard.shape
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(standard), rtol=1e-4, atol=1e-4
    )

    # no-weights path synthesizes a single uniform speaker and squeezes
    std_nw = model.apply(params, frames)
    fused_nw = model.apply(params, frames)
    np.testing.assert_allclose(
        np.asarray(fused_nw), np.asarray(std_nw), rtol=1e-4, atol=1e-4
    )


def test_grad_flows_through_kernel():
    """Training with the fused pooling on must work: the kernel's custom VJP
    differentiates the unfused reference, so grads match it exactly."""
    keys = jax.random.split(jax.random.PRNGKey(8), 5)
    x = _rand(keys[0], 2, 31, 128)
    hidden = jnp.tanh(_rand(keys[1], 2, 31, 32))
    w2 = _rand(keys[2], 32, 128) * 0.2
    b2 = _rand(keys[3], 128) * 0.1
    weights = jax.nn.sigmoid(_rand(keys[4], 2, 3, 31))

    def loss(fn):
        def inner(x, hidden, w2):
            den, s1, s2 = fn(x, hidden, w2, b2, weights)
            return jnp.sum(s1**2) + jnp.sum(s2) + jnp.sum(den**2)

        return inner

    fused = lambda *a: fused_attentive_stats(*a, interpret=True)
    gf = jax.grad(loss(fused), argnums=(0, 1, 2))(x, hidden, w2)
    gr = jax.grad(loss(attentive_stats_reference), argnums=(0, 1, 2))(
        x, hidden, w2
    )
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-4
        )
