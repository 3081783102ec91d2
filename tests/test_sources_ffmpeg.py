"""FFmpegAudioSource: container/URL streaming through an ffmpeg subprocess.

Capability parity with the reference's torchaudio StreamReader sources
(``/root/reference/src/diart/sources.py:274-322``) without new Python
dependencies. The subprocess plumbing (arg assembly, f32le re-blocking,
error propagation, teardown) is exercised against a fake ffmpeg binary so
the tests are hermetic; one test runs the real binary when present."""

import os
import shutil
import stat
import sys

import numpy as np
import pytest

from diart_tpu.runtime import FFmpegAudioSource

SAMPLE_RATE = 16000


def _write_fake(path, body: str) -> str:
    path.write_text(f"#!{sys.executable}\n{body}")
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


@pytest.fixture
def fake_ffmpeg(tmp_path):
    """A stand-in ffmpeg: finds the ``-i`` input among its args and copies
    the file's bytes (pre-made f32le PCM) to stdout."""
    return _write_fake(
        tmp_path / "ffmpeg",
        "import sys\n"
        "args = sys.argv[1:]\n"
        "path = args[args.index('-i') + 1]\n"
        "assert 'f32le' in args and '-ac' in args, args\n"
        "sys.stdout.buffer.write(open(path, 'rb').read())\n",
    )


def _collect(source):
    blocks = []
    source.stream.subscribe(
        on_next=blocks.append, on_error=blocks.append
    )
    source.read()
    return blocks


class TestFFmpegSource:
    def test_missing_binary_raises(self):
        with pytest.raises(FileNotFoundError, match="not found on PATH"):
            FFmpegAudioSource("x.mp3", SAMPLE_RATE, binary="no-such-ffmpeg-xyz")

    def test_blocks_roundtrip(self, tmp_path, fake_ffmpeg):
        rng = np.random.default_rng(0)
        signal = rng.normal(scale=0.1, size=SAMPLE_RATE * 2 + 123).astype(np.float32)
        raw = tmp_path / "clip.f32"
        raw.write_bytes(signal.tobytes())

        source = FFmpegAudioSource(
            raw, SAMPLE_RATE, block_duration=0.5, binary=fake_ffmpeg
        )
        assert source.uri == "clip"
        blocks = _collect(source)
        assert all(isinstance(b, np.ndarray) and b.ndim == 2 for b in blocks)
        full_blocks = blocks[:-1]
        assert all(b.shape == (1, SAMPLE_RATE // 2) for b in full_blocks)
        out = np.concatenate([b[0] for b in blocks])
        np.testing.assert_array_equal(out, signal)

    def test_url_uri_and_unknown_duration(self, fake_ffmpeg):
        source = FFmpegAudioSource(
            "https://example.com/live/show.mp3", SAMPLE_RATE, binary=fake_ffmpeg
        )
        assert source.uri == "show.mp3"
        assert source.duration is None  # live URL: never probed

    def test_duration_via_ffprobe(self, tmp_path, fake_ffmpeg):
        _write_fake(tmp_path / "ffprobe", "print('2.5')\n")
        raw = tmp_path / "clip.f32"
        raw.write_bytes(b"\x00" * 64)
        source = FFmpegAudioSource(raw, SAMPLE_RATE, binary=fake_ffmpeg)
        assert source.duration == pytest.approx(2.5)

    def test_decoder_failure_propagates(self, tmp_path):
        bad = _write_fake(
            tmp_path / "ffmpeg",
            "import sys\nsys.stderr.write('boom: unsupported codec')\nsys.exit(3)\n",
        )
        raw = tmp_path / "clip.f32"
        raw.write_bytes(b"")
        source = FFmpegAudioSource(raw, SAMPLE_RATE, binary=bad)
        events = _collect(source)
        assert len(events) == 1
        assert isinstance(events[0], RuntimeError)
        assert "boom: unsupported codec" in str(events[0])

    def test_close_stops_stream(self, tmp_path, fake_ffmpeg):
        raw = tmp_path / "clip.f32"
        raw.write_bytes(np.zeros(SAMPLE_RATE * 10, np.float32).tobytes())
        source = FFmpegAudioSource(raw, SAMPLE_RATE, binary=fake_ffmpeg)
        seen = []

        def on_next(block):
            seen.append(block)
            source.close()  # a consumer hanging up mid-stream

        source.stream.subscribe(on_next=on_next)
        source.read()
        assert len(seen) == 1

    @pytest.mark.skipif(
        shutil.which("ffmpeg") is None, reason="ffmpeg binary not installed"
    )
    def test_real_ffmpeg_decodes_wav(self, tmp_path):
        t = np.arange(SAMPLE_RATE, dtype=np.float32) / SAMPLE_RATE
        signal = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        wav = tmp_path / "tone.wav"
        import wave

        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SAMPLE_RATE)
            w.writeframes(
                np.clip(signal * 32768, -32768, 32767).astype(np.int16).tobytes()
            )
        source = FFmpegAudioSource(wav, SAMPLE_RATE, block_duration=0.25)
        blocks = [b for b in _collect(source) if isinstance(b, np.ndarray)]
        out = np.concatenate([b[0] for b in blocks])
        assert out.shape[0] == SAMPLE_RATE
        assert np.max(np.abs(out - signal)) < 1e-3  # 16-bit quantization
