"""Model-level tests: shapes, frame math, powerset decoding, weighted
pooling, wrapper registry, serialization, and the training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diart_tpu.models import (
    EmbeddingModel,
    PyanNet,
    SegmentationModel,
    XVectorSincNet,
    num_powerset_classes,
    num_sincnet_frames,
    powerset_mapping,
    resample_weights,
    to_multilabel,
    weighted_stats_pool,
)


class TestFrameMath:
    def test_flagship_geometry(self):
        # 5 s @ 16 kHz -> 293 frames (SURVEY.md §3.2)
        assert num_sincnet_frames(80000) == 293
        # 2 s -> 115 frames
        assert num_sincnet_frames(32000) == 115


class TestPowerset:
    def test_mapping_order(self):
        m = powerset_mapping(3, 2)
        assert m.shape == (7, 3)
        # pyannote ordering: {}, singletons, pairs
        np.testing.assert_array_equal(m[0], [0, 0, 0])
        np.testing.assert_array_equal(m[1], [1, 0, 0])
        np.testing.assert_array_equal(m[4], [1, 1, 0])
        assert num_powerset_classes(3, 2) == 7

    def test_to_multilabel_argmax(self):
        m = powerset_mapping(3, 2)
        scores = jnp.asarray(np.log([[0.1, 0.1, 0.1, 0.1, 0.5, 0.05, 0.05]]))[None]
        out = to_multilabel(scores, m)
        np.testing.assert_array_equal(np.asarray(out)[0, 0], [1, 1, 0])


class TestPooling:
    def test_weighted_stats(self, rng):
        frames = jnp.asarray(rng.normal(size=(2, 50, 8)).astype(np.float32))
        w = jnp.asarray(rng.uniform(0.1, 1, (2, 3, 50)).astype(np.float32))
        out = np.asarray(weighted_stats_pool(frames, w))
        assert out.shape == (2, 3, 16)
        # hand-check stream 0 speaker 0
        wn = np.asarray(w)[0, 0] / np.asarray(w)[0, 0].sum()
        mean = (np.asarray(frames)[0] * wn[:, None]).sum(0)
        np.testing.assert_allclose(out[0, 0, :8], mean, atol=1e-4)

    def test_uniform_weights_match_plain_stats(self, rng):
        frames = jnp.asarray(rng.normal(size=(1, 40, 4)).astype(np.float32))
        w = jnp.ones((1, 1, 40))
        out = np.asarray(weighted_stats_pool(frames, w))[0, 0]
        f = np.asarray(frames)[0]
        np.testing.assert_allclose(out[:4], f.mean(0), atol=1e-5)
        # pyannote StatsPool semantics: unbiased std (torch default)
        np.testing.assert_allclose(out[4:], f.std(0, ddof=1), atol=1e-3)

    def test_resample_weights_nearest(self):
        w = jnp.asarray(np.arange(10, dtype=np.float32))[None, None]
        out = np.asarray(resample_weights(w, 5))[0, 0]
        np.testing.assert_array_equal(out, [0, 2, 4, 6, 8])


class TestWrappers:
    def test_registry_and_call(self):
        seg = SegmentationModel.from_pretrained(
            "tpu/pyannet", num_speakers=3, lstm_hidden=16, lstm_layers=1,
            init_samples=8000,
        )
        out = seg(np.zeros((2, 1, 8000), np.float32))
        assert out.shape == (2, num_sincnet_frames(8000), 3)
        assert seg.num_speakers == 3
        assert seg.sample_rate == 16000

    def test_powerset_registry(self):
        seg = SegmentationModel.from_pretrained(
            "tpu/pyannet-powerset", num_speakers=3, max_simultaneous=2,
            init_samples=8000,
        )
        out = np.asarray(seg(np.zeros((1, 1, 8000), np.float32)))
        assert out.shape[-1] == 3
        assert set(np.unique(out)).issubset({0.0, 1.0})

    def test_lazy_loading(self):
        seg = SegmentationModel.from_pretrained("tpu/pyannet", init_samples=8000)
        assert not seg.is_in_memory()
        seg.load()
        assert seg.is_in_memory()

    def test_embedding_reference_convention(self):
        emb = EmbeddingModel.from_pretrained(
            "tpu/xvector", embedding_dim=32, init_samples=8000
        )
        wave = np.zeros((2, 1, 8000), np.float32)
        frames = emb.trunk_fn()(emb.params, jnp.asarray(wave))
        weights = np.ones((2, frames.shape[1]), np.float32)
        out = emb(wave, weights)  # (B, frames) weights -> (B, dim)
        assert out.shape == (2, 32)

    def test_save_load_roundtrip(self, tmp_path):
        seg = SegmentationModel.from_pretrained(
            "tpu/pyannet", num_speakers=4, init_samples=8000
        )
        seg.load()
        path = tmp_path / "seg.msgpack"
        seg.save(path)
        loaded = SegmentationModel.from_pretrained(str(path))
        x = np.random.default_rng(0).normal(size=(1, 1, 8000)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(seg(x)), np.asarray(loaded(x)), atol=1e-6
        )

    def test_save_load_roundtrip_xvect_sb(self, tmp_path):
        """Native serialization reconstructs the speechbrain x-vector's
        non-default geometry (nested tdnn_specs survive the JSON config)."""
        emb = EmbeddingModel.from_pretrained(
            "tpu/xvect-sb",
            embedding_dim=24,
            tdnn_specs=((5, 1, 16), (3, 2, 16), (3, 3, 16), (1, 1, 16), (1, 1, 48)),
            init_samples=8000,
        )
        emb.load()
        path = tmp_path / "xvect.msgpack"
        emb.save(path)
        loaded = EmbeddingModel.from_pretrained(str(path))
        loaded.load()
        assert loaded.module.tdnn_specs == emb.module.tdnn_specs
        x = np.random.default_rng(1).normal(
            scale=0.1, size=(1, 1, 8000)
        ).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(emb(x)), np.asarray(loaded(x)), atol=1e-6
        )


class TestTraining:
    def test_pit_loss_permutation_invariance(self, rng):
        from diart_tpu.train import pit_bce_loss

        pred = jnp.asarray(rng.uniform(0.01, 0.99, (2, 30, 3)).astype(np.float32))
        target = jnp.asarray((rng.uniform(size=(2, 30, 3)) > 0.5).astype(np.float32))
        base = float(pit_bce_loss(pred, target))
        permuted = target[..., [2, 0, 1]]
        assert float(pit_bce_loss(pred, permuted)) == pytest.approx(base, rel=1e-5)

    def test_train_step_reduces_loss(self):
        from diart_tpu.train import make_train_state, train_step

        seg = SegmentationModel.from_pretrained(
            "tpu/pyannet", num_speakers=2, lstm_hidden=8, lstm_layers=1,
            linear_dims=(8,), init_samples=4000,
        )
        seg.load()
        apply_fn = seg.apply_fn()
        state, tx = make_train_state(seg.params, learning_rate=1e-3)
        rng = np.random.default_rng(0)
        waves = jnp.asarray(rng.normal(scale=0.1, size=(4, 1, 4000)).astype(np.float32))
        frames = apply_fn(seg.params, waves).shape[1]
        targets = jnp.asarray(
            (rng.uniform(size=(4, frames, 2)) > 0.6).astype(np.float32)
        )
        step = jax.jit(lambda s, w, t: train_step(apply_fn, tx, s, w, t))
        losses = []
        for _ in range(8):
            state, loss = step(state, waves, targets)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestEcapa:
    def test_shapes_and_weighted_head(self, rng):
        from diart_tpu.models import EmbeddingModel

        emb = EmbeddingModel.from_pretrained("tpu/ecapa", init_samples=16000)
        emb.load()
        import jax.numpy as jnp

        wave = jnp.asarray(
            rng.normal(scale=0.1, size=(2, 1, 16000)).astype(np.float32)
        )
        frames = emb.trunk_fn()(emb.params, wave)
        assert frames.shape[0] == 2 and frames.shape[2] == 3 * 512
        w = jnp.asarray(rng.uniform(0, 1, (2, 3, 100)).astype(np.float32))
        out = np.asarray(emb.head_fn()(emb.params, frames, w))
        assert out.shape == (2, 3, 192)
        assert np.isfinite(out).all()

    def test_weights_differentiate_speakers(self, rng):
        """Disjoint temporal weights over different content must produce
        different embeddings; identical weights identical ones."""
        from diart_tpu.models import EmbeddingModel
        import jax.numpy as jnp

        emb = EmbeddingModel.from_pretrained("tpu/ecapa", init_samples=16000)
        emb.load()
        wave = rng.normal(scale=0.1, size=(1, 1, 16000)).astype(np.float32)
        wave[0, 0, :8000] += np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)
        frames = emb.trunk_fn()(emb.params, jnp.asarray(wave))
        T = frames.shape[1]
        w = np.zeros((1, 3, T), np.float32)
        w[0, 0, : T // 2] = 1.0
        w[0, 1, T // 2 :] = 1.0
        w[0, 2, : T // 2] = 1.0  # same as speaker 0
        out = np.asarray(emb.head_fn()(emb.params, frames, jnp.asarray(w)))
        np.testing.assert_allclose(out[0, 0], out[0, 2], atol=1e-5)
        assert np.linalg.norm(out[0, 0] - out[0, 1]) > 1e-3


class TestFbank:
    def test_tone_lands_in_right_mel_band(self):
        from diart_tpu.models import log_mel_filterbank, mel_filter_matrix
        import jax.numpy as jnp

        sr = 16000
        t = np.arange(sr) / sr
        for f0 in (300.0, 2000.0):
            x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
            mel = np.asarray(log_mel_filterbank(jnp.asarray(x[None]), sample_rate=sr))
            band = mel.mean(axis=1)[0].argmax()
            # the peak band's center frequency should be near f0
            filters = mel_filter_matrix(80, 400, sr)
            freqs = np.arange(201) * sr / 400
            center = freqs[filters[band].argmax()]
            assert abs(center - f0) < max(120, 0.2 * f0), (f0, center)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from diart_tpu.train import (
            make_train_state,
            restore_train_state,
            save_train_state,
            latest_checkpoint,
        )

        seg = SegmentationModel.from_pretrained(
            "tpu/pyannet", num_speakers=2, lstm_hidden=8, lstm_layers=1,
            linear_dims=(8,), init_samples=4000,
        )
        seg.load()
        state, tx = make_train_state(seg.params)
        state = state._replace(step=jnp.asarray(7, jnp.int32))
        save_train_state(tmp_path, state)
        assert latest_checkpoint(tmp_path).name == "step_00000007.msgpack"

        fresh, _ = make_train_state(seg.params)
        restored = restore_train_state(tmp_path, fresh)
        assert int(restored.step) == 7
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_pruning(self, tmp_path):
        from diart_tpu.train import make_train_state, save_train_state

        seg = SegmentationModel.from_pretrained(
            "tpu/pyannet", num_speakers=2, lstm_hidden=8, lstm_layers=1,
            linear_dims=(8,), init_samples=4000,
        )
        seg.load()
        state, _ = make_train_state(seg.params)
        for step in range(5):
            save_train_state(tmp_path, state._replace(step=jnp.asarray(step)), keep=2)
        remaining = sorted(p.name for p in tmp_path.glob("step_*.msgpack"))
        assert remaining == ["step_00000003.msgpack", "step_00000004.msgpack"]


class TestNonDefaultSerialization:
    def test_roundtrip_preserves_architecture(self, tmp_path):
        seg = SegmentationModel.from_pretrained(
            "tpu/pyannet", num_speakers=3, lstm_hidden=16, lstm_layers=1,
            linear_dims=(16,), init_samples=8000,
        )
        seg.load()
        path = tmp_path / "m.msgpack"
        seg.save(path)
        loaded = SegmentationModel.from_pretrained(str(path))
        x = np.random.default_rng(0).normal(size=(1, 1, 8000)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(seg(x)), np.asarray(loaded(x)), atol=1e-6
        )
        assert loaded.num_speakers == 3

    def test_ecapa_roundtrip(self, tmp_path):
        """EmbeddingModel.save must record the module class so non-XVector
        architectures reload (ADVICE r1: _load_native hardcoded the class)."""
        emb = EmbeddingModel.from_pretrained(
            "tpu/ecapa", embedding_dim=64, channels=64, init_samples=8000
        )
        emb.load()
        path = tmp_path / "ecapa.msgpack"
        emb.save(path)
        loaded = EmbeddingModel.from_pretrained(str(path))
        loaded.load()
        assert type(loaded.module).__name__ == "EcapaTDNN"
        assert loaded.embedding_dim == 64
        x = np.random.default_rng(0).normal(scale=0.1, size=(1, 1, 8000)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(emb(x)), np.asarray(loaded(x)), atol=1e-5
        )


class TestSeedStability:
    def test_seed_is_process_independent(self):
        """Registry weights must be identical across spawn workers: the seed
        cannot come from str.__hash__ (per-process randomized)."""
        from diart_tpu.models.base import _seed_from_name
        import subprocess, sys

        here = _seed_from_name("tpu/pyannet")
        code = (
            "from diart_tpu.models.base import _seed_from_name;"
            "print(_seed_from_name('tpu/pyannet'))"
        )
        for hashseed in ("0", "12345"):
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, check=True,
                env={**__import__('os').environ, "PYTHONHASHSEED": hashseed},
            )
            assert int(out.stdout.strip()) == here


class TestResNet34:
    def test_registry_shapes_and_weighted_head(self, rng):
        emb = EmbeddingModel.from_pretrained(
            "tpu/resnet34", embedding_dim=64, base_channels=8, init_samples=8000
        )
        emb.load()
        wave = jnp.asarray(rng.normal(scale=0.1, size=(2, 1, 8000)).astype(np.float32))
        frames = emb.trunk_fn()(emb.params, wave)
        assert frames.shape[0] == 2 and frames.shape[2] == (80 // 8) * 8 * 8
        w = jnp.asarray(rng.uniform(0, 1, (2, 3, 100)).astype(np.float32))
        out = np.asarray(emb.head_fn()(emb.params, frames, w))
        assert out.shape == (2, 3, 64)
        assert np.isfinite(out).all()

    def test_native_roundtrip(self, tmp_path):
        emb = EmbeddingModel.from_pretrained(
            "tpu/resnet34", embedding_dim=32, base_channels=8, init_samples=8000
        )
        emb.load()
        path = tmp_path / "rn.msgpack"
        emb.save(path)
        loaded = EmbeddingModel.from_pretrained(str(path))
        loaded.load()
        assert type(loaded.module).__name__ == "ResNet34"
        x = np.random.default_rng(0).normal(scale=0.1, size=(1, 1, 8000)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(emb(x)), np.asarray(loaded(x)), atol=1e-5)


class TestEmbeddingTraining:
    def test_aam_margin_penalizes_target(self, rng):
        """With a margin, the loss for a correctly-classified sample is
        strictly larger than plain softmax (margin tightens the decision)."""
        from diart_tpu.train import aam_softmax_loss

        emb = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        protos = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        labels = jnp.asarray([0, 1, 2, 3])
        plain = float(aam_softmax_loss(emb, labels, protos, margin=0.0))
        margined = float(aam_softmax_loss(emb, labels, protos, margin=0.3))
        assert margined > plain

    def test_train_step_separates_speakers(self):
        """A few AAM steps on two synthetic tone speakers must reduce the
        loss and pull the embeddings of same-speaker chunks together."""
        from diart_tpu.models import EmbeddingModel
        from diart_tpu.train import embedding_train_step, make_embedding_train_state

        emb_model = EmbeddingModel.from_pretrained(
            "tpu/xvector", embedding_dim=16, init_samples=8000
        )
        emb_model.load()
        module, model_params = emb_model.module, emb_model.params

        def embed_fn(params, waves):
            return module.apply(params, waves)

        rng = np.random.default_rng(0)
        t = np.arange(8000) / 16000.0
        waves, labels = [], []
        for i in range(8):
            spk = i % 2
            f0 = 500.0 if spk == 0 else 1800.0
            waves.append(
                (0.3 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.normal(size=8000)).astype(np.float32)
            )
            labels.append(spk)
        waves = jnp.asarray(np.stack(waves))[:, None, :]
        labels = jnp.asarray(labels)

        state, tx = make_embedding_train_state(
            model_params, num_classes=2, embedding_dim=16, learning_rate=1e-3
        )
        step = jax.jit(
            lambda s, w, l: embedding_train_step(embed_fn, tx, s, w, l)
        )
        losses = []
        for _ in range(12):
            state, loss = step(state, waves, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

        out = np.asarray(embed_fn(state.params["model"], waves))
        out = out / np.linalg.norm(out, axis=1, keepdims=True)
        same = np.mean([out[0] @ out[2], out[1] @ out[3]])
        cross = np.mean([out[0] @ out[1], out[2] @ out[3]])
        assert same > cross

    def test_sharded_step_matches_single_device(self):
        """Data-parallel embedding training over the virtual mesh produces
        the same loss as unsharded."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from diart_tpu.models import EmbeddingModel
        from diart_tpu.train import embedding_train_step, make_embedding_train_state

        emb_model = EmbeddingModel.from_pretrained(
            "tpu/xvector", embedding_dim=8, init_samples=8000
        )
        emb_model.load()
        module, model_params = emb_model.module, emb_model.params
        embed_fn = lambda p, w: module.apply(p, w)

        rng = np.random.default_rng(1)
        waves = jnp.asarray(rng.normal(scale=0.1, size=(8, 1, 8000)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 4, size=(8,)))

        state, tx = make_embedding_train_state(model_params, 4, 8, seed=3)
        _, plain_loss = jax.jit(
            lambda s, w, l: embedding_train_step(embed_fn, tx, s, w, l)
        )(state, waves, labels)

        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        dp = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        sharded_step = jax.jit(
            lambda s, w, l: embedding_train_step(embed_fn, tx, s, w, l),
            in_shardings=(rep, dp, dp),
            out_shardings=(rep, rep),
        )
        state2, _ = make_embedding_train_state(model_params, 4, 8, seed=3)
        _, sharded_loss = sharded_step(
            jax.device_put(state, rep), jax.device_put(waves, dp), jax.device_put(labels, dp)
        )
        np.testing.assert_allclose(float(plain_loss), float(sharded_loss), rtol=1e-5)


    def test_too_short_waveform_raises(self):
        from diart_tpu.models import EmbeddingModel

        emb = EmbeddingModel.from_pretrained(
            "tpu/xvector", embedding_dim=8, init_samples=8000
        )
        emb.load()
        with pytest.raises(ValueError, match="too short"):
            emb(np.zeros((1, 1, 4000), np.float32))
