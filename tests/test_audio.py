"""Audio loading tests: python decoder, native C++ decoder, duration probe."""

import numpy as np
import pytest

from diart_tpu.audio import AudioLoader, read_wav, write_wav
from diart_tpu.native import native_available, wav_decode_mono, wav_probe


@pytest.fixture
def stereo_wav(tmp_path, rng):
    wave = rng.uniform(-0.8, 0.8, (2, 32000)).astype(np.float32)
    path = tmp_path / "stereo.wav"
    write_wav(path, wave, 16000)
    return path, wave


class TestPythonDecoder:
    def test_roundtrip_16bit(self, stereo_wav):
        path, wave = stereo_wav
        decoded, rate = read_wav(path)
        assert rate == 16000
        assert decoded.shape == wave.shape
        # write scales by 32767, read by 32768: ~1e-4 worst-case quantization
        np.testing.assert_allclose(decoded, wave, atol=1e-4)

    def test_loader_mono_downmix(self, stereo_wav):
        path, wave = stereo_wav
        loaded = AudioLoader(16000, mono=True).load(path)
        assert loaded.shape == (1, 32000)
        np.testing.assert_allclose(loaded[0], wave.mean(axis=0), atol=1.0 / 16000)

    def test_duration_probe(self, stereo_wav):
        path, _ = stereo_wav
        assert AudioLoader(16000).get_duration(path) == pytest.approx(2.0)

    def test_loader_resamples(self, tmp_path, rng):
        wave = rng.uniform(-0.5, 0.5, (1, 48000)).astype(np.float32)
        path = tmp_path / "x.wav"
        write_wav(path, wave, 48000)
        loaded = AudioLoader(16000).load(path)
        assert loaded.shape == (1, 16000)


class TestNativeDecoder:
    def test_native_builds(self):
        assert native_available(), "C++ toolchain should be present"

    def test_matches_python_decoder(self, stereo_wav):
        if not native_available():
            pytest.skip("no compiler")
        path, wave = stereo_wav
        decoded, rate = wav_decode_mono(path)
        assert rate == 16000
        ref, _ = read_wav(path)
        np.testing.assert_allclose(decoded[0], ref.mean(axis=0), atol=1e-6)

    def test_probe(self, stereo_wav):
        if not native_available():
            pytest.skip("no compiler")
        path, _ = stereo_wav
        assert wav_probe(path) == (16000, 32000, 2)
