"""Parity tests for the fused SE-Res2Block Pallas kernel.

The kernel (ops/pallas_res2.py) replaces each ECAPA SE-Res2Block on TPU;
these tests pin it (interpreter mode on the CPU backend) against the
unfused oracle and against the flax module path, so the TPU fast path
provably computes the same trunk activations the checkpoint-fidelity tests
certify.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diart_tpu.ops.pallas_res2 import (
    fused_se_res2_block,
    se_res2_block_reference,
)


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


def _params(key, chans, scale, taps, hidden):
    """Unit-gain random block parameters.

    Weight scales are 0.5/sqrt(fan_in), i.e. spectral norm ~1 per stage —
    the regime real BN-folded checkpoints live in. This conditioning is
    load-bearing: with O(1)-entry random weights (the original 0.2 scale),
    w1's spectral norm is ~9 and each group conv's ~5, so the 7-group
    sequential cascade amplifies benign f32 rounding noise by ~1e5 and
    turns relu threshold flips into O(10) output divergence — measured at
    the ECAPA geometry as f32-reference-vs-f64 max error 24.9 and
    tap-reorder sensitivity 0.65 (scripts/res2_conditioning_check.py).
    That chaos was misread as a compiled-kernel parity failure in round 2;
    every kernel variant (different grids, boundary handling, scratch
    materialization) reproduced the identical error pattern, proving the
    divergence lives in the formulation's conditioning, not the lowering.
    """
    width = chans // scale
    groups = scale - 1
    ks = jax.random.split(key, 12)
    mk = lambda k, *s: _rand(k, *s) * (0.5 / np.sqrt(s[-2]))
    return (
        mk(ks[0], chans, chans),  # w1
        _rand(ks[1], chans) * 0.1,  # b1
        1.0 + 0.1 * _rand(ks[2], chans),  # a1
        0.1 * _rand(ks[3], chans),  # c1
        _rand(ks[4], groups, taps, width, width) * (0.5 / np.sqrt(taps * width)),  # wg
        0.1 * _rand(ks[5], groups, width),  # bg
        1.0 + 0.1 * _rand(ks[6], groups, width),  # ag
        0.1 * _rand(ks[7], groups, width),  # cg
        mk(ks[8], chans, chans),  # w2
        _rand(ks[9], chans) * 0.1,  # b2
        1.0 + 0.1 * _rand(ks[10], chans),  # a2
        0.1 * _rand(ks[11], chans),  # c2
        mk(ks[0], chans, hidden),  # ws1
        0.1 * _rand(ks[1], hidden),  # bs1
        mk(ks[2], hidden, chans),  # ws2
        0.1 * _rand(ks[3], chans),  # bs2
    )


@pytest.mark.parametrize(
    "batch,time,chans,scale,dilation",
    [
        (8, 501, 512, 8, 3),  # the ECAPA engine's exact geometry
        (3, 41, 256, 4, 2),  # odd batch -> single-row cells
        (2, 64, 128, 2, 4),  # minimal scale, wide dilation
    ],
)
def test_kernel_matches_reference(batch, time, chans, scale, dilation):
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = _rand(keys[0], batch, time, chans)
    params = _params(keys[1], chans, scale, 3, 128)

    got = fused_se_res2_block(x, params, dilation, interpret=True)
    want = se_res2_block_reference(x, *params, dilation)
    # f32 reduction-order noise only: on this geometry the kernel is CLOSER
    # to a float64 oracle (5.3e-4 max abs) than the f32 reference is
    # (1.0e-3) — outputs are O(100) after two 512-long contractions
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=5e-3
    )


def test_kernel_bf16_no_noisier_than_flax_bf16(monkeypatch):
    """bf16 trunks compute with bf16 weights (flax ``dtype``) and round
    every stored intermediate, and the 7-group sequential chain amplifies
    rounding differences — the kernel carries the same noise, not more.
    Bound: the fused block's error against the f32 flax truth is comparable
    to the standard bf16 flax path's own error."""
    from diart_tpu import precision
    from diart_tpu.models.ecapa import _SERes2Block

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 256), jnp.float32)
    block32 = _SERes2Block(256, 3, 2, res2_scale=8, se_bottleneck=64)
    params = block32.init(jax.random.PRNGKey(3), x)
    truth = np.asarray(block32.apply(params, x))

    block16 = _SERes2Block(
        256, 3, 2, res2_scale=8, se_bottleneck=64,
        compute_dtype=jnp.bfloat16,
    )
    xb = x.astype(jnp.bfloat16)
    std16 = np.asarray(block16.apply(params, xb), np.float32)

    monkeypatch.setattr(precision, "enabled", lambda f: f == "pallas_res2")
    fused16 = block16.apply(params, xb)
    assert fused16.dtype == jnp.bfloat16
    err_kernel = np.abs(np.asarray(fused16, np.float32) - truth).max()
    err_std = np.abs(std16 - truth).max()
    assert err_kernel <= 2.0 * err_std + 1e-3, (err_kernel, err_std)


def test_fused_block_matches_flax_module(monkeypatch):
    """Full module: _SERes2Block with the fused kernel forced on == the
    standard flax path, on the same parameters."""
    from diart_tpu.models.ecapa import _SERes2Block

    block = _SERes2Block(128, 3, 2, res2_scale=4, se_bottleneck=32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 37, 128), jnp.float32)
    params = block.init(jax.random.PRNGKey(3), x)
    standard = block.apply(params, x)

    from diart_tpu import precision

    monkeypatch.setattr(precision, "enabled", lambda f: f == "pallas_res2")
    fused = block.apply(params, x)
    assert fused.shape == standard.shape
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(standard), rtol=1e-4, atol=1e-4
    )


def test_fused_trunk_matches_standard_trunk(monkeypatch):
    """Whole-model check: EcapaTDNN trunk with all three blocks fused == the
    standard path (random init, CPU interpret mode)."""
    from diart_tpu.models.ecapa import EcapaTDNN

    model = EcapaTDNN(channels=64, embedding_dim=32)
    wave = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 16000), jnp.float32)
    params = model.init(jax.random.PRNGKey(5), wave)
    standard = model.apply(params, wave, method="trunk")

    from diart_tpu import precision

    monkeypatch.setattr(precision, "enabled", lambda f: f == "pallas_res2")
    fused = model.apply(params, wave, method="trunk")
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(standard), rtol=1e-4, atol=1e-4
    )


def test_grad_flows_through_kernel():
    """Training with the fused block on must work: the kernel's custom VJP
    differentiates the unfused reference, so grads match it exactly."""
    keys = jax.random.split(jax.random.PRNGKey(8), 2)
    x = _rand(keys[0], 2, 31, 128)
    params = _params(keys[1], 128, 4, 3, 32)

    def loss_fused(x, w1):
        p = (w1,) + params[1:]
        return jnp.sum(fused_se_res2_block(x, p, 2, interpret=True) ** 2)

    def loss_ref(x, w1):
        return jnp.sum(se_res2_block_reference(x, w1, *params[1:], 2) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params[0])
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params[0])
    for a, b in zip(gf, gr):
        # the VJP differentiates the reference formulation exactly; the
        # forward residuals differ only by f32 reduction order
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-2
        )
