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


class TestMalformedWav:
    """Malformed headers must be rejected, not crash the process
    (SIGFPE on bits<8, OOB read on sub-32-bit float data)."""

    @staticmethod
    def _wav_bytes(fmt_code, bits, channels=1, data=b"\x00" * 64):
        import struct

        fmt = struct.pack(
            "<HHIIHH", fmt_code, channels, 16000,
            16000 * channels * max(bits // 8, 1), channels * max(bits // 8, 1),
            bits,
        )
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    @pytest.mark.parametrize("fmt_code,bits", [(1, 4), (1, 7), (1, 12), (3, 16), (3, 8)])
    def test_native_rejects_bad_bits(self, tmp_path, fmt_code, bits):
        if not native_available():
            pytest.skip("no compiler")
        path = tmp_path / "bad.wav"
        path.write_bytes(self._wav_bytes(fmt_code, bits))
        assert wav_probe(path) is None
        assert wav_decode_mono(path) is None

    def test_native_accepts_float32(self, tmp_path):
        if not native_available():
            pytest.skip("no compiler")
        samples = np.linspace(-0.5, 0.5, 16, dtype=np.float32)
        path = tmp_path / "f32.wav"
        path.write_bytes(self._wav_bytes(3, 32, data=samples.tobytes()))
        decoded, rate = wav_decode_mono(path)
        assert rate == 16000
        np.testing.assert_allclose(decoded[0], samples, atol=1e-7)


class TestWavBlockReader:
    def test_streams_match_full_decode(self, stereo_wav):
        from diart_tpu.audio import WavBlockReader

        path, wave = stereo_wav
        with WavBlockReader(path) as reader:
            assert reader.sample_rate == 16000
            assert reader.num_frames == 32000
            blocks = []
            while True:
                block = reader.read_block(7000)  # deliberately odd size
                if block.size == 0:
                    break
                blocks.append(block)
        streamed = np.concatenate(blocks)
        full, _ = read_wav(path)
        np.testing.assert_allclose(streamed, full.mean(axis=0), atol=1e-6)

    def test_rejects_malformed(self, tmp_path):
        from diart_tpu.audio import WavBlockReader

        path = tmp_path / "bad.wav"
        path.write_bytes(b"RIFF\x00\x00\x00\x00WAVEjunk")
        with pytest.raises(ValueError):
            WavBlockReader(path)
