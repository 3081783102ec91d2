"""Parity tests for the fused projection+statistics Pallas kernel.

The kernel (ops/pallas_stats.py) replaces the x-vector head's
``tdnn4 -> leaky -> batch-norm -> weighted moments`` tail on TPU; these
tests pin it (interpreter mode on the CPU backend) against the unfused
einsum oracle and against the full standard head path, so the TPU fast path
provably computes the same embeddings the checkpoint-fidelity tests certify.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diart_tpu.models.embedding import XVectorSincNet, weighted_stats_pool
from diart_tpu.ops.pallas_stats import fused_linear_stats, linear_stats_reference


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize(
    "batch,time,c_in,channels,speakers",
    [
        (8, 279, 512, 1500, 4),  # the engine's exact geometry
        (3, 37, 24, 300, 1),  # odd batch -> single-row cells, tail tile
        (2, 50, 16, 128, 6),  # single channel tile
    ],
)
def test_kernel_matches_reference(batch, time, c_in, channels, speakers):
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    x = _rand(keys[0], batch, time, c_in)
    w = _rand(keys[1], c_in, channels) * 0.1
    b = _rand(keys[2], channels) * 0.1
    scale = 1.0 + 0.1 * _rand(keys[3], channels)
    shift = 0.1 * _rand(keys[4], channels)
    weights = jax.nn.sigmoid(_rand(keys[5], batch, speakers, time))

    s1, s2 = fused_linear_stats(x, w, b, scale, shift, weights, interpret=True)
    r1, r2 = linear_stats_reference(x, w, b, scale, shift, weights)
    np.testing.assert_allclose(s1, r1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s2, r2, rtol=1e-5, atol=1e-4)


def test_kernel_bf16_input_close_to_f32():
    keys = jax.random.split(jax.random.PRNGKey(1), 6)
    x = _rand(keys[0], 4, 64, 128)
    w = _rand(keys[1], 128, 256) * 0.1
    b = _rand(keys[2], 256) * 0.1
    scale = 1.0 + 0.1 * _rand(keys[3], 256)
    shift = 0.1 * _rand(keys[4], 256)
    weights = jax.nn.sigmoid(_rand(keys[5], 4, 2, 64))

    s1, s2 = fused_linear_stats(
        x.astype(jnp.bfloat16), w, b, scale, shift, weights, interpret=True
    )
    r1, r2 = linear_stats_reference(x, w, b, scale, shift, weights)
    assert s1.dtype == jnp.float32  # f32 accumulation regardless of input
    np.testing.assert_allclose(s1, r1, rtol=2e-2, atol=2e-1)
    np.testing.assert_allclose(s2, r2, rtol=2e-2, atol=5e-1)


def test_fused_head_matches_standard_head(monkeypatch):
    """Full model: __call__ via the fused trunk/head split == the standard
    path, on the same parameters. The gate is forced on (it is TPU-only by
    default); the kernel auto-selects interpreter mode off-TPU."""
    import diart_tpu.models.embedding as emb_mod

    model = XVectorSincNet()
    wave = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 32000), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), wave)
    weights = jax.nn.sigmoid(
        jax.random.normal(jax.random.PRNGKey(4), (2, 3, 117), jnp.float32)
    )

    standard = model.apply(params, wave, weights)
    trunk_std = model.apply(params, wave, method="trunk")
    assert trunk_std.shape[-1] == 1500

    from diart_tpu import precision

    monkeypatch.setattr(precision, "enabled", lambda f: f == "pallas_head")
    trunk_fused = model.apply(params, wave, method="trunk")
    assert trunk_fused.shape[-1] == 512  # stops before the final projection
    fused = model.apply(params, trunk_fused, weights, method="head")
    fused_call = model.apply(params, wave, weights)

    np.testing.assert_allclose(fused, standard, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(fused_call, standard, rtol=1e-4, atol=1e-4)


def test_fused_head_no_weights_squeeze(monkeypatch):
    import diart_tpu.models.embedding as emb_mod

    model = XVectorSincNet()
    wave = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 32000), jnp.float32)
    params = model.init(jax.random.PRNGKey(6), wave)
    standard = model.apply(params, wave)

    from diart_tpu import precision

    monkeypatch.setattr(precision, "enabled", lambda f: f == "pallas_head")
    fused = model.apply(params, wave)
    assert fused.shape == standard.shape == (2, 512)
    np.testing.assert_allclose(fused, standard, rtol=1e-4, atol=1e-4)


def test_fused_head_matches_standard_head_xvect_fbank(monkeypatch):
    """The speechbrain fbank x-vector shares the fused projection+moments
    head (same 1x1 final TDNN geometry); fused == standard on the same
    parameters, including the +1e-5 std offset."""
    from diart_tpu.models import XVectorFbank

    model = XVectorFbank(
        embedding_dim=32,
        tdnn_specs=((5, 1, 16), (3, 2, 16), (3, 3, 16), (1, 1, 16), (1, 1, 48)),
    )
    wave = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 16000), jnp.float32)
    params = model.init(jax.random.PRNGKey(8), wave)
    weights = jax.nn.sigmoid(
        jax.random.normal(jax.random.PRNGKey(9), (2, 3, 101), jnp.float32)
    )
    standard = model.apply(params, wave, weights)
    trunk_std = model.apply(params, wave, method="trunk")
    assert trunk_std.shape[-1] == 48

    from diart_tpu import precision

    monkeypatch.setattr(precision, "enabled", lambda f: f == "pallas_head")
    trunk_fused = model.apply(params, wave, method="trunk")
    assert trunk_fused.shape[-1] == 16  # stops before the final projection
    fused = model.apply(params, trunk_fused, weights, method="head")
    fused_call = model.apply(params, wave, weights)

    np.testing.assert_allclose(fused, standard, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(fused_call, standard, rtol=1e-4, atol=1e-4)


def test_grad_flows_through_kernel():
    """Training with the fused head on must work: the kernel's custom VJP
    differentiates the unfused reference, so grads match it exactly."""
    keys = jax.random.split(jax.random.PRNGKey(8), 6)
    x = _rand(keys[0], 2, 31, 16)
    w = _rand(keys[1], 16, 128) * 0.1
    b = _rand(keys[2], 128) * 0.1
    scale = 1.0 + 0.1 * _rand(keys[3], 128)
    shift = 0.1 * _rand(keys[4], 128)
    weights = jax.nn.sigmoid(_rand(keys[5], 2, 3, 31))

    def loss_fused(x, w, b):
        s1, s2 = fused_linear_stats(x, w, b, scale, shift, weights, interpret=True)
        return jnp.sum(s1**2) + jnp.sum(s2)

    def loss_ref(x, w, b):
        s1, s2 = linear_stats_reference(x, w, b, scale, shift, weights)
        return jnp.sum(s1**2) + jnp.sum(s2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-4)


def test_moments_equal_weighted_stats_pool():
    """stats_from_moments + kernel == weighted_stats_pool on the projected
    frames (the exact algebra the fused head relies on)."""
    from diart_tpu.models.embedding import stats_from_moments

    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    x = _rand(keys[0], 2, 45, 32)
    w = _rand(keys[1], 32, 140) * 0.2
    b = _rand(keys[2], 140) * 0.1
    scale = 1.0 + 0.1 * _rand(keys[3], 140)
    shift = 0.1 * _rand(keys[4], 140)
    weights = jax.nn.sigmoid(_rand(keys[5], 2, 4, 45))

    y = jnp.einsum("btc,cd->btd", x, w) + b
    y = jnp.where(y >= 0, y, 0.01 * y)
    frames = y * scale + shift
    expected = weighted_stats_pool(frames, weights)

    s1, s2 = fused_linear_stats(x, w, b, scale, shift, weights, interpret=True)
    got = stats_from_moments(
        s1, s2, jnp.sum(weights, axis=-1), jnp.sum(weights**2, axis=-1)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)
