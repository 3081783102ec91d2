"""Trunk compute-dtype threading across every embedding family.

The flagship serving config runs embedding trunks in bf16 (embeddings only
feed cosine distances for clustering — ``bench.py --emb-dtype``). Round-1
measurements showed the mel-fbank families (ECAPA / ResNet34 / TitaNet)
silently ignored the registry ``dtype`` kwarg and ran f32 matmuls at 1/4 of
the MXU's bf16 rate; these tests pin the threading for all families and the
bf16-vs-f32 numerical closeness that justifies the fast path.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from diart_tpu.models import EmbeddingModel

SAMPLES = 16000

FAMILIES = {
    "tpu/xvector": dict(embedding_dim=64),
    "tpu/ecapa": dict(embedding_dim=32, channels=32),
    "tpu/resnet34": dict(embedding_dim=32, base_channels=8),
    "tpu/titanet": dict(embedding_dim=32, channels=32),
}


def _build(family, dtype):
    kwargs = dict(FAMILIES[family], init_samples=SAMPLES, dtype=dtype)
    model = EmbeddingModel.from_registry(family, **kwargs)
    model.load()
    return model


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_registry_threads_compute_dtype(family):
    assert _build(family, "bf16").module.compute_dtype is jnp.bfloat16
    assert _build(family, "f32").module.compute_dtype is jnp.float32


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_bf16_trunk_matches_f32(family):
    """Same parameters (same registry seed), bf16 vs f32 trunk: embeddings
    must stay directionally equivalent — cosine similarity is what the
    clustering consumes."""
    f32 = _build(family, "f32")
    bf16 = _build(family, "bf16")
    chex = np.testing.assert_array_equal
    np_f32 = np.asarray(
        jnp.concatenate([leaf.ravel() for leaf in
                         __import__("jax").tree_util.tree_leaves(f32.params)])
    )
    np_bf16 = np.asarray(
        jnp.concatenate([leaf.ravel() for leaf in
                         __import__("jax").tree_util.tree_leaves(bf16.params)])
    )
    chex(np_f32, np_bf16)  # identical params: only the compute dtype differs

    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.normal(scale=0.1, size=(2, 1, SAMPLES)).astype(np.float32))
    weights = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(2, 3, 40)).astype(np.float32)
    )
    e32 = np.asarray(f32.module.apply(f32.params, wave, weights), np.float32)
    e16 = np.asarray(bf16.module.apply(bf16.params, wave, weights), np.float32)
    assert e32.shape == e16.shape

    def unit(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)

    cos = np.sum(unit(e32) * unit(e16), axis=-1)
    assert cos.min() > 0.98, f"{family}: min cosine {cos.min()}"


def test_with_dtype_after_load():
    model = _build("tpu/ecapa", "f32")
    assert model.module.compute_dtype is jnp.float32
    model.with_dtype("bf16")
    assert model.module.compute_dtype is jnp.bfloat16
    # and on a not-yet-loaded model
    lazy = EmbeddingModel.from_registry(
        "tpu/ecapa", embedding_dim=32, channels=32, init_samples=SAMPLES
    ).with_dtype("bf16")
    lazy.load()
    assert lazy.module.compute_dtype is jnp.bfloat16


def test_with_dtype_ignores_non_dataclass_modules():
    model = EmbeddingModel.from_apply(
        lambda p, w: jnp.zeros((w.shape[0], 5, 8)),
        lambda p, f, wt: jnp.zeros((f.shape[0], wt.shape[1], 8)),
    ).with_dtype("bf16")
    model.load()
    assert not dataclasses.is_dataclass(model.module)
