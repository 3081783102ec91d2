"""Per-layer equivalence tests: converted torch weights must reproduce torch
outputs in the JAX modules (checkpoint-conversion fidelity, SURVEY.md hard
part 5)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diart_tpu.models.convert import (
    _dense,
    _lstm_params,
    pyannet_params_from_state_dict,
)
from diart_tpu.models.lstm import BiLSTM
from diart_tpu.models.segmentation import PyanNet


class TestLSTMEquivalence:
    @pytest.mark.parametrize("layers", [1, 2])
    def test_bilstm_matches_torch(self, layers):
        torch.manual_seed(0)
        in_dim, hidden, batch, time = 12, 16, 3, 20
        t_lstm = torch.nn.LSTM(
            in_dim, hidden, num_layers=layers, bidirectional=True, batch_first=True
        )
        x = torch.randn(batch, time, in_dim)
        with torch.no_grad():
            want, _ = t_lstm(x)

        sd = {f"lstm.{k}": v for k, v in t_lstm.state_dict().items()}
        params = {"params": _lstm_params(sd, layers)}
        params = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)), params)
        model = BiLSTM(hidden_size=hidden, num_layers=layers)
        got = model.apply(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TestDenseEquivalence:
    def test_linear(self):
        torch.manual_seed(1)
        lin = torch.nn.Linear(8, 5)
        x = torch.randn(4, 8)
        sd = {f"fc.{k}": v for k, v in lin.state_dict().items()}
        p = _dense(sd, "fc")
        got = np.asarray(x.numpy() @ p["kernel"] + p["bias"])
        with torch.no_grad():
            want = lin(x).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestConvEquivalence:
    def test_conv1d_layout(self):
        """torch (out,in,k) -> flax (k,in,out) produces identical outputs."""
        import flax.linen as nn

        torch.manual_seed(2)
        conv = torch.nn.Conv1d(6, 10, kernel_size=5, dilation=2)
        x = torch.randn(2, 6, 50)
        with torch.no_grad():
            want = conv(x).numpy()  # (2, 10, T')

        fconv = nn.Conv(features=10, kernel_size=(5,), kernel_dilation=(2,), padding="VALID")
        params = {
            "params": {
                "kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0)),
                "bias": jnp.asarray(conv.bias.detach().numpy()),
            }
        }
        got = fconv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=2e-5
        )


class TestInstanceNormEquivalence:
    def test_instance_norm(self):
        from diart_tpu.models.sincnet import _instance_norm

        torch.manual_seed(3)
        norm = torch.nn.InstanceNorm1d(7, affine=True)
        with torch.no_grad():
            norm.weight.copy_(torch.randn(7))
            norm.bias.copy_(torch.randn(7))
        x = torch.randn(2, 7, 40)
        with torch.no_grad():
            want = norm(x).numpy()
        got = _instance_norm(
            jnp.asarray(x.numpy()),
            jnp.asarray(norm.weight.detach().numpy()),
            jnp.asarray(norm.bias.detach().numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestFullPyanNetConversion:
    def test_state_dict_roundtrip_shapes(self):
        """A synthetic torch PyanNet-shaped state dict converts into a tree
        accepted by our module (full forward runs)."""
        torch.manual_seed(4)
        sd = {}
        # sincnet
        sd["sincnet.wav_norm1d.weight"] = torch.randn(1)
        sd["sincnet.wav_norm1d.bias"] = torch.randn(1)
        sd["sincnet.conv1d.0.low_hz_"] = torch.rand(40, 1) * 100
        sd["sincnet.conv1d.0.band_hz_"] = torch.rand(40, 1) * 100
        sd["sincnet.norm1d.0.weight"] = torch.randn(80)
        sd["sincnet.norm1d.0.bias"] = torch.randn(80)
        sd["sincnet.conv1d.1.weight"] = torch.randn(60, 80, 5)
        sd["sincnet.conv1d.1.bias"] = torch.randn(60)
        sd["sincnet.norm1d.1.weight"] = torch.randn(60)
        sd["sincnet.norm1d.1.bias"] = torch.randn(60)
        sd["sincnet.conv1d.2.weight"] = torch.randn(60, 60, 5)
        sd["sincnet.conv1d.2.bias"] = torch.randn(60)
        sd["sincnet.norm1d.2.weight"] = torch.randn(60)
        sd["sincnet.norm1d.2.bias"] = torch.randn(60)
        # lstm 2 layers bidirectional, hidden 32
        h = 32
        for layer, in_dim in ((0, 60), (1, 2 * h)):
            for suffix in ("", "_reverse"):
                sd[f"lstm.weight_ih_l{layer}{suffix}"] = torch.randn(4 * h, in_dim)
                sd[f"lstm.weight_hh_l{layer}{suffix}"] = torch.randn(4 * h, h)
                sd[f"lstm.bias_ih_l{layer}{suffix}"] = torch.randn(4 * h)
                sd[f"lstm.bias_hh_l{layer}{suffix}"] = torch.randn(4 * h)
        # linears + classifier
        sd["linear.0.weight"] = torch.randn(64, 2 * h)
        sd["linear.0.bias"] = torch.randn(64)
        sd["linear.1.weight"] = torch.randn(64, 64)
        sd["linear.1.bias"] = torch.randn(64)
        sd["classifier.weight"] = torch.randn(3, 64)
        sd["classifier.bias"] = torch.randn(3)

        params = pyannet_params_from_state_dict(sd, num_layers=2)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float32), params
        )
        model = PyanNet(
            num_speakers=3, lstm_hidden=h, lstm_layers=2, linear_dims=(64, 64)
        )
        wave = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 16000)), jnp.float32)
        out = model.apply(params, wave)
        assert out.shape[0] == 1 and out.shape[2] == 3
        assert np.all(np.isfinite(np.asarray(out)))


class _SneakyPayload:
    """Module-level so torch.save can pickle it; weights_only=True must
    still refuse to load it."""


class TestSafeCheckpointLoading:
    def test_plain_tensor_checkpoint_loads_safely(self, tmp_path):
        import torch
        from diart_tpu.models.convert import _load_torch_state_dict

        path = tmp_path / "ok.pt"
        torch.save({"state_dict": {"w": torch.ones(3)}}, path)
        sd = _load_torch_state_dict(path)
        assert "w" in sd

    def test_arbitrary_pickle_requires_opt_in(self, tmp_path, monkeypatch):
        """Checkpoints that need full unpickling (arbitrary code execution
        risk) must be rejected unless explicitly trusted (ADVICE r1)."""
        import torch
        from diart_tpu.models.convert import _load_torch_state_dict

        path = tmp_path / "sneaky.pt"
        torch.save(
            {"state_dict": {"w": torch.ones(2)}, "obj": _SneakyPayload()}, path
        )
        monkeypatch.delenv("DIART_TPU_TRUST_CHECKPOINTS", raising=False)
        # Sneaky lives in this test module, so weights_only=True refuses it
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="DIART_TPU_TRUST_CHECKPOINTS"):
            _load_torch_state_dict(path)
        sd = _load_torch_state_dict(path, trust_pickle=True)
        assert "w" in sd


class TestPretrainedArchitectureFidelity:
    """Full-forward equivalence against faithful plain-torch replicas of the
    real pyannote architectures (tests/torch_replicas.py) — the strongest
    zero-egress proof that `from_pretrained` will load real checkpoints
    correctly (VERDICT r1 item 2). Exercises the complete from_torch path:
    torch.save -> safe load -> layout conversion -> JAX forward."""

    def test_pyannet_full_forward_5s(self, tmp_path):
        from torch_replicas import TorchPyanNet
        from diart_tpu.models import SegmentationModel

        torch.manual_seed(11)
        net = TorchPyanNet(
            num_speakers=4, lstm_hidden=128, lstm_layers=4, linear_dims=(128, 128)
        ).eval()
        path = tmp_path / "pyannet.pt"
        torch.save(net.state_dict(), path)

        seg = SegmentationModel.from_pretrained(str(path))
        wave = np.random.default_rng(3).normal(scale=0.2, size=(2, 1, 80000)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = net(torch.from_numpy(wave)).numpy()
        out = np.asarray(seg(wave))
        assert out.shape == ref.shape == (2, 293, 4)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_xvector_full_forward_5s(self, tmp_path):
        from torch_replicas import TorchXVectorSincNet
        from diart_tpu.models import EmbeddingModel

        torch.manual_seed(12)
        net = TorchXVectorSincNet(dimension=512).eval()
        path = tmp_path / "xvector.pt"
        torch.save(net.state_dict(), path)

        emb = EmbeddingModel.from_pretrained(str(path))
        rng = np.random.default_rng(5)
        wave = rng.normal(scale=0.2, size=(2, 1, 80000)).astype(np.float32)
        # weights on the 293-frame segmentation grid (requires the nearest
        # interpolation onto the trunk's own frame grid, as in production)
        weights = rng.uniform(0.0, 1.0, (2, 293)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(wave), weights=torch.from_numpy(weights)).numpy()
        out = np.asarray(emb(wave, weights))
        assert out.shape == ref.shape == (2, 512)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=1e-4 * max(scale, 1.0))

    def test_xvector_unweighted_matches(self, tmp_path):
        from torch_replicas import TorchXVectorSincNet
        from diart_tpu.models import EmbeddingModel

        torch.manual_seed(13)
        net = TorchXVectorSincNet(dimension=64).eval()
        path = tmp_path / "xv64.pt"
        torch.save(net.state_dict(), path)
        emb = EmbeddingModel.from_pretrained(str(path))
        wave = np.random.default_rng(6).normal(scale=0.2, size=(1, 1, 32000)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = net(torch.from_numpy(wave)).numpy()
        out = np.asarray(emb(wave))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=1e-4 * max(scale, 1.0))


class TestEcapaConversionFidelity:
    """Full-forward equivalence against a faithful torch replica of
    speechbrain's ECAPA_TDNN (state-dict layout of spkrec-ecapa-voxceleb)."""

    def _converted(self, tmp_path, torch_net):
        from diart_tpu.models import EmbeddingModel

        path = tmp_path / "ecapa_sb.pt"
        torch.save(torch_net.state_dict(), path)
        emb = EmbeddingModel.from_pretrained(str(path))
        emb.load()
        return emb

    def test_feature_level_full_forward(self, tmp_path):
        from torch_replicas import SBEcapaTDNN

        torch.manual_seed(21)
        net = SBEcapaTDNN(lin_neurons=192).eval()
        emb = self._converted(tmp_path, net)
        assert type(emb.module).__name__ == "EcapaTDNN"
        assert emb.embedding_dim == 192

        rng = np.random.default_rng(2)
        feats = rng.normal(scale=1.0, size=(2, 120, 80)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(feats)).numpy()
        frames = emb.module.apply(
            emb.params, jnp.asarray(feats), method="trunk_from_features"
        )
        out = np.asarray(emb.module.apply(emb.params, frames, method="head"))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=2e-4 * scale)

    def test_waveform_level_with_fbank(self, tmp_path):
        from torch_replicas import SBEcapaTDNN, sb_fbank

        torch.manual_seed(22)
        net = SBEcapaTDNN(lin_neurons=64).eval()
        emb = self._converted(tmp_path, net)
        rng = np.random.default_rng(3)
        wave = rng.normal(scale=0.2, size=(1, 1, 32000)).astype(np.float32)
        with torch.no_grad():
            feats = sb_fbank(torch.from_numpy(wave[:, 0]))
            feats = feats - feats.mean(dim=1, keepdim=True)
            ref = net(feats).numpy()
        out = np.asarray(emb(wave))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=2e-4 * scale)


class TestXvectSBConversionFidelity:
    """Full-forward equivalence against a faithful torch replica of
    speechbrain's Xvector lobes model (state-dict layout of
    spkrec-xvect-voxceleb: fbank(24) frontend, reflect-padded TDNN stack,
    statistics pooling with unbiased std + 1e-5)."""

    def _converted(self, tmp_path, torch_net):
        from diart_tpu.models import EmbeddingModel

        path = tmp_path / "xvect_sb.pt"
        torch.save(torch_net.state_dict(), path)
        emb = EmbeddingModel.from_pretrained(str(path))
        emb.load()
        return emb

    def test_feature_level_full_forward(self, tmp_path):
        from torch_replicas import SBXVector

        torch.manual_seed(41)
        net = SBXVector(
            in_channels=24, lin_neurons=96, tdnn_channels=(32, 32, 32, 32, 96)
        ).eval()
        emb = self._converted(tmp_path, net)
        assert type(emb.module).__name__ == "XVectorFbank"
        assert emb.embedding_dim == 96
        assert emb.module.num_mels == 24

        rng = np.random.default_rng(11)
        feats = rng.normal(scale=1.0, size=(2, 120, 24)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(feats)).numpy()
        frames = emb.module.apply(
            emb.params, jnp.asarray(feats), method="trunk_from_features"
        )
        out = np.asarray(emb.module.apply(emb.params, frames, method="head"))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=2e-4 * scale)

    def test_waveform_level_with_fbank(self, tmp_path):
        from torch_replicas import SBXVector, sb_fbank

        torch.manual_seed(42)
        net = SBXVector(
            in_channels=24, lin_neurons=48, tdnn_channels=(24, 24, 24, 24, 64)
        ).eval()
        emb = self._converted(tmp_path, net)
        rng = np.random.default_rng(12)
        wave = rng.normal(scale=0.2, size=(1, 1, 32000)).astype(np.float32)
        with torch.no_grad():
            feats = sb_fbank(torch.from_numpy(wave[:, 0]), n_mels=24)
            feats = feats - feats.mean(dim=1, keepdim=True)
            ref = net(feats).numpy()
        out = np.asarray(emb(wave))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=2e-4 * scale)

    def test_weighted_head_matches_uniform(self, tmp_path):
        """All-ones external weights reproduce the unweighted embedding
        (the +1e-5 std offset and unbiased variance must agree between the
        squeeze path and the per-speaker path)."""
        from torch_replicas import SBXVector

        torch.manual_seed(43)
        net = SBXVector(
            in_channels=24, lin_neurons=32, tdnn_channels=(16, 16, 16, 16, 48)
        ).eval()
        emb = self._converted(tmp_path, net)
        rng = np.random.default_rng(13)
        wave = rng.normal(scale=0.2, size=(2, 1, 16000)).astype(np.float32)
        plain = np.asarray(emb(wave))
        frames = emb.module.apply(emb.params, jnp.asarray(wave), method="trunk")
        ones = jnp.ones((2, 3, 101), jnp.float32)
        weighted = np.asarray(
            emb.module.apply(emb.params, frames, ones, method="head")
        )
        assert weighted.shape == (2, 3, 32)
        np.testing.assert_allclose(weighted[:, 1], plain, atol=1e-5)


class TestResNetConversionFidelity:
    """Full-forward equivalence against a faithful torch replica of
    wespeaker's ResNet34 (state-dict layout of wespeaker-voxceleb-resnet34)."""

    def test_feature_level_full_forward(self, tmp_path):
        from torch_replicas import WSResNet34
        from diart_tpu.models import EmbeddingModel

        torch.manual_seed(31)
        net = WSResNet34(embed_dim=256).eval()
        path = tmp_path / "resnet34.pt"
        torch.save(net.state_dict(), path)
        emb = EmbeddingModel.from_pretrained(str(path))
        emb.load()
        assert type(emb.module).__name__ == "ResNet34"
        assert emb.embedding_dim == 256

        rng = np.random.default_rng(7)
        feats = rng.normal(scale=1.0, size=(2, 96, 80)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(feats)).numpy()
        frames = emb.module.apply(
            emb.params, jnp.asarray(feats), method="trunk_from_features"
        )
        out = np.asarray(emb.module.apply(emb.params, frames, method="head"))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=2e-4 * scale)

    def test_waveform_level_with_kaldi_fbank(self, tmp_path):
        from torch_replicas import WSResNet34, kaldi_fbank
        from diart_tpu.models import EmbeddingModel

        torch.manual_seed(32)
        net = WSResNet34(embed_dim=64).eval()
        path = tmp_path / "rn64.pt"
        torch.save(net.state_dict(), path)
        emb = EmbeddingModel.from_pretrained(str(path))
        rng = np.random.default_rng(8)
        wave = rng.normal(scale=0.2, size=(1, 1, 32000)).astype(np.float32)
        with torch.no_grad():
            feats = kaldi_fbank(torch.from_numpy(wave[:, 0]))
            feats = feats - feats.mean(dim=1, keepdim=True)  # wespeaker CMN
            ref = net(feats).numpy()
        out = np.asarray(emb(wave))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=2e-4 * scale)

    def test_prefixed_checkpoint(self, tmp_path):
        """pyannote-wrapped wespeaker checkpoints prefix keys with
        'resnet.'; the sniffing loader must handle it."""
        from torch_replicas import WSResNet34
        from diart_tpu.models import EmbeddingModel

        torch.manual_seed(33)
        net = WSResNet34(embed_dim=64).eval()
        sd = {f"resnet.{k}": v for k, v in net.state_dict().items()}
        path = tmp_path / "wrapped.pt"
        torch.save(sd, path)
        emb = EmbeddingModel.from_pretrained(str(path))
        emb.load()
        assert type(emb.module).__name__ == "ResNet34"
        assert emb.embedding_dim == 64


class TestPowersetCheckpoint:
    def test_powerset_declaration(self, tmp_path):
        """A raw 7-output checkpoint loaded with powerset=(3, 2) must decode
        to 3-speaker multilabel output matching the torch log-softmax path."""
        from torch_replicas import TorchPyanNet
        from diart_tpu.models import SegmentationModel
        from diart_tpu.models.powerset import powerset_mapping

        torch.manual_seed(41)
        net = TorchPyanNet(
            num_speakers=7, lstm_hidden=32, lstm_layers=2, linear_dims=(32,)
        ).eval()
        path = tmp_path / "ps.pt"
        torch.save(net.state_dict(), path)

        seg = SegmentationModel.from_pretrained(str(path), powerset=(3, 2))
        wave = np.random.default_rng(1).normal(scale=0.2, size=(1, 1, 32000)).astype(
            np.float32
        )
        out = np.asarray(seg(wave))
        assert out.shape[-1] == 3
        assert seg.num_speakers == 3
        # decode the torch side by argmax over powerset classes
        with torch.no_grad():
            x = net.sincnet(torch.from_numpy(wave)).transpose(1, 2)
            x, _ = net.lstm(x)
            for lin in net.linear:
                x = torch.nn.functional.leaky_relu(lin(x))
            logits = net.classifier(x).numpy()  # (1, T, 7) pre-activation
        mapping = np.asarray(powerset_mapping(3, 2))
        expected = mapping[logits.argmax(-1)]
        np.testing.assert_array_equal(out, expected)

    def test_powerset_class_mismatch_raises(self, tmp_path):
        from torch_replicas import TorchPyanNet
        from diart_tpu.models import SegmentationModel

        torch.manual_seed(42)
        net = TorchPyanNet(num_speakers=4, lstm_hidden=16, lstm_layers=1).eval()
        path = tmp_path / "bad_ps.pt"
        torch.save(net.state_dict(), path)
        with pytest.raises(ValueError, match="implies 7 classes"):
            SegmentationModel.from_pretrained(str(path), powerset=(3, 2)).load()


class TestTitanetConversionFidelity:
    """Full-forward equivalence against a faithful torch replica of NeMo's
    TitaNet (JasperBlock encoder + SpeakerDecoder layout)."""

    def test_feature_level_full_forward(self, tmp_path):
        from torch_replicas import NMTitaNet
        from diart_tpu.models import EmbeddingModel

        torch.manual_seed(61)
        net = NMTitaNet(channels=64, embed_dim=48).eval()
        path = tmp_path / "titanet.pt"
        torch.save(net.state_dict(), path)
        emb = EmbeddingModel.from_pretrained(str(path))
        emb.load()
        assert type(emb.module).__name__ == "TitaNet"
        assert emb.embedding_dim == 48

        rng = np.random.default_rng(9)
        feats = rng.normal(scale=1.0, size=(2, 90, 80)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(feats)).numpy()
        frames = emb.module.apply(
            emb.params, jnp.asarray(feats), method="trunk_from_features"
        )
        out = np.asarray(emb.module.apply(emb.params, frames, method="head"))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=2e-4 * scale)

    def test_waveform_level_full_forward(self, tmp_path):
        """From raw 16 kHz audio: our NeMo-exact mel frontend + converted
        encoder must match the torch replica (preprocessor + network)
        end-to-end — the fidelity contract a real
        ``nvidia/speakerverification_en_titanet_large`` checkpoint needs."""
        from torch_replicas import NMTitaNet, nemo_fbank
        from diart_tpu.models import EmbeddingModel

        torch.manual_seed(62)
        net = NMTitaNet(channels=48, embed_dim=40).eval()
        path = tmp_path / "titanet_wave.pt"
        torch.save(net.state_dict(), path)
        emb = EmbeddingModel.from_pretrained(str(path))
        emb.load()

        rng = np.random.default_rng(10)
        wave = rng.normal(scale=0.1, size=(2, 32000)).astype(np.float32)
        with torch.no_grad():
            feats_t = nemo_fbank(torch.from_numpy(wave))
            ref = net(feats_t).numpy()

        feats_j = np.asarray(
            emb.module.apply(emb.params, jnp.asarray(wave[:, None, :]), method="features")
        )
        scale_f = max(np.abs(feats_t.numpy()).max(), 1.0)
        np.testing.assert_allclose(feats_j, feats_t.numpy(), atol=2e-4 * scale_f)

        out = np.asarray(emb.module.apply(emb.params, jnp.asarray(wave[:, None, :])))
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(out, ref, atol=5e-4 * scale)

    def test_registry_and_weighted_head(self):
        from diart_tpu.models import EmbeddingModel

        emb = EmbeddingModel.from_pretrained(
            "tpu/titanet", embedding_dim=32, channels=32, init_samples=8000
        )
        emb.load()
        rng = np.random.default_rng(2)
        wave = jnp.asarray(rng.normal(scale=0.1, size=(2, 1, 8000)).astype(np.float32))
        frames = emb.trunk_fn()(emb.params, wave)
        assert frames.shape[2] == 3 * 32
        w = jnp.asarray(rng.uniform(0, 1, (2, 3, 40)).astype(np.float32))
        out = np.asarray(emb.head_fn()(emb.params, frames, w))
        assert out.shape == (2, 3, 32)
        assert np.isfinite(out).all()
