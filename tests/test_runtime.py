"""End-to-end streaming runtime tests with hermetic fake models.

The hermetic analogue of the reference's CI smoke runs (SURVEY.md §4):
synthetic two-speaker audio -> FileAudioSource -> StreamingInference ->
RTTMWriter, scored with our own DER.
"""

import numpy as np
import pytest

from diart_tpu import (
    SpeakerDiarization,
    SpeakerDiarizationConfig,
    VoiceActivityDetection,
    VoiceActivityDetectionConfig,
)
from diart_tpu.audio import AudioLoader, write_wav
from diart_tpu.core import load_rttm
from diart_tpu.metrics import DetectionErrorRate, DiarizationErrorRate
from diart_tpu.runtime import (
    FileAudioSource,
    IteratorAudioSource,
    RTTMWriter,
    StreamingInference,
)
from diart_tpu.runtime.operators import rearrange_audio_stream

from fakes import (
    SAMPLE_RATE,
    Turn,
    fake_embedding,
    fake_segmentation,
    synth_audio,
    turns_to_annotation,
)

TURNS = [
    Turn(0.0, 3.0, 0),
    Turn(4.0, 7.0, 1),
    Turn(8.0, 11.0, 0),
    Turn(9.5, 12.0, 1),  # overlap region
]
TOTAL = 13.0


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("audio") / "synth.wav"
    write_wav(path, synth_audio(TURNS, TOTAL), SAMPLE_RATE)
    return path


def make_config(**kwargs):
    return SpeakerDiarizationConfig(
        segmentation=fake_segmentation(),
        embedding=fake_embedding(),
        duration=2.0,
        step=0.5,
        latency=kwargs.pop("latency", 0.5),
        tau_active=0.6,
        rho_update=0.1,
        delta_new=0.7,
        max_speakers=8,
        sample_rate=SAMPLE_RATE,
        **kwargs,
    )


class TestRearrangeOperator:
    def test_sliding_windows(self):
        blocks = [np.full((1, 4000), i, dtype=np.float32) for i in range(12)]
        source = IteratorAudioSource("it", SAMPLE_RATE, blocks, total_duration=3.0)
        chunks = []
        source.stream.pipe(
            rearrange_audio_stream(duration=1.0, step=0.25, sample_rate=SAMPLE_RATE)
        ).subscribe(on_next=chunks.append)
        source.read()
        # 3s of audio -> first chunk at 1.0s, then every 0.25s: 9 chunks
        assert len(chunks) == 9
        assert chunks[0].extent.start == 0.0
        assert chunks[1].extent.start == pytest.approx(0.25)
        assert all(c.data.shape[0] == SAMPLE_RATE for c in chunks)

    def test_irregular_blocks(self):
        rng = np.random.default_rng(0)
        pieces, remaining = [], 32000
        while remaining > 0:
            n = min(int(rng.integers(100, 3000)), remaining)
            pieces.append(np.zeros((1, n), np.float32))
            remaining -= n
        source = IteratorAudioSource("it", SAMPLE_RATE, pieces)
        chunks = []
        source.stream.pipe(
            rearrange_audio_stream(duration=1.0, step=0.5, sample_rate=SAMPLE_RATE)
        ).subscribe(on_next=chunks.append)
        source.read()
        assert len(chunks) == 3  # 2s -> chunks at 1.0, 1.5, 2.0

    def test_hop_larger_than_window(self):
        """hop > window: the inter-window gap is discarded as it arrives.
        Regression: the drop step used to advance the fifo origin past
        samples that had not arrived yet, silently filling later windows
        with audio from the wrong absolute position."""
        from diart_tpu.runtime.operators import SlidingChunker

        sr = SAMPLE_RATE
        chunker = SlidingChunker(
            window_samples=sr, hop_samples=2 * sr, sample_rate=sr
        )
        # absolute ramp so window content encodes sample indices
        audio = np.arange(5 * sr, dtype=np.float32)
        out = []
        for start in range(0, 5 * sr, 1250):  # irregular-ish block size
            out.extend(chunker.push(audio[None, start : start + 1250]))
        assert [w.extent.start for w in out] == [0.0, 2.0, 4.0]
        np.testing.assert_array_equal(out[0].data[:, 0], audio[:sr])
        np.testing.assert_array_equal(
            out[1].data[:, 0], audio[2 * sr : 3 * sr]
        )
        np.testing.assert_array_equal(
            out[2].data[:, 0], audio[4 * sr : 5 * sr]
        )


class TestFileSource:
    def test_blocks_and_padding(self, wav_file):
        source = FileAudioSource(
            wav_file, SAMPLE_RATE, padding=(1.0, 0.5), block_duration=0.5
        )
        assert source.duration == pytest.approx(TOTAL + 1.5)
        blocks = []
        source.stream.subscribe(on_next=blocks.append)
        source.read()
        assert all(b.shape == (1, 8000) for b in blocks)
        total_seconds = len(blocks) * 0.5
        assert total_seconds == pytest.approx(np.ceil((TOTAL + 1.5) * 2) / 2)
        # padding is silent
        assert np.abs(blocks[0]).max() == 0.0


class TestVADEndToEnd:
    def test_detection_error(self, wav_file, tmp_path):
        config = VoiceActivityDetectionConfig(
            segmentation=fake_segmentation(),
            duration=2.0,
            step=0.5,
            latency=0.5,
            tau_active=0.6,
            sample_rate=SAMPLE_RATE,
        )
        pipeline = VoiceActivityDetection(config)
        padding = config.get_file_padding(wav_file)
        source = FileAudioSource(wav_file, SAMPLE_RATE, padding, config.step)
        pipeline.set_timestamp_shift(-padding[0])
        inference = StreamingInference(
            pipeline, source, batch_size=1, do_profile=False, show_progress=False
        )
        rttm_path = tmp_path / "vad.rttm"
        inference.attach_observers(RTTMWriter(source.uri, rttm_path))
        prediction = inference()

        ref = turns_to_annotation(TURNS)
        det = DetectionErrorRate()
        error = det(ref, prediction)
        assert error < 0.15, f"detection error {error:.3f}"
        assert rttm_path.exists()

    def test_latency_max(self, wav_file):
        config = VoiceActivityDetectionConfig(
            segmentation=fake_segmentation(),
            duration=2.0,
            step=0.5,
            latency="max",
            tau_active=0.6,
            sample_rate=SAMPLE_RATE,
        )
        assert config.latency == 2.0
        pipeline = VoiceActivityDetection(config)
        padding = config.get_file_padding(wav_file)
        source = FileAudioSource(wav_file, SAMPLE_RATE, padding, config.step)
        pipeline.set_timestamp_shift(-padding[0])
        inference = StreamingInference(
            pipeline, source, batch_size=1, do_profile=False, show_progress=False
        )
        prediction = inference()
        error = DetectionErrorRate()(turns_to_annotation(TURNS), prediction)
        assert error < 0.15


class TestDiarizationEndToEnd:
    @pytest.mark.parametrize("batch_size", [1, 4])
    def test_der(self, wav_file, tmp_path, batch_size):
        config = make_config()
        pipeline = SpeakerDiarization(config)
        padding = config.get_file_padding(wav_file)
        source = FileAudioSource(wav_file, SAMPLE_RATE, padding, config.step)
        pipeline.set_timestamp_shift(-padding[0])
        inference = StreamingInference(
            pipeline,
            source,
            batch_size=batch_size,
            do_profile=False,
            show_progress=False,
        )
        rttm_path = tmp_path / "diar.rttm"
        inference.attach_observers(RTTMWriter(source.uri, rttm_path))
        prediction = inference()

        ref = turns_to_annotation(TURNS)
        der = DiarizationErrorRate()
        error = der(ref, prediction)
        assert error < 0.2, f"DER {error:.3f}"

        # speakers must be consistent: exactly 2 speakers found
        assert len(prediction.labels()) == 2

        # written RTTM parses back and matches the accumulated prediction
        loaded = load_rttm(rttm_path)[source.uri]
        assert len(loaded.labels()) == 2

    def test_batch_size_invariance(self, wav_file):
        """batch_size pre-computation must not change results
        (reference claim: inference.py:259-265)."""
        preds = []
        for batch_size in (1, 8):
            config = make_config()
            pipeline = SpeakerDiarization(config)
            padding = config.get_file_padding(wav_file)
            source = FileAudioSource(wav_file, SAMPLE_RATE, padding, config.step)
            pipeline.set_timestamp_shift(-padding[0])
            inference = StreamingInference(
                pipeline, source, batch_size=batch_size,
                do_profile=False, show_progress=False,
            )
            preds.append(inference())
        der = DiarizationErrorRate()
        assert der(preds[0], preds[1]) == pytest.approx(0.0, abs=1e-6)


class TestStreamingPlot:
    def test_headless_render(self, tmp_path):
        """StreamingPlot renders under the Agg backend: figure + axes built,
        prediction/audio/reference panels populated, optimal mapping applied."""
        import matplotlib

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        from diart_tpu.core.annotation import Annotation
        from diart_tpu.core.segment import Segment, SlidingWindow, SlidingWindowFeature
        from diart_tpu.runtime.sinks import StreamingPlot

        ref = Annotation("u")
        ref[Segment(0.0, 2.0), 0] = "alice"
        ref_path = tmp_path / "ref.rttm"
        with open(ref_path, "w") as f:
            ref.write_rttm(f)

        plot = StreamingPlot(duration=2.0, latency=0.5, reference=ref_path)
        pred = Annotation("u")
        pred[Segment(0.0, 1.5), 0] = "speaker0"
        sr = 16000
        audio = SlidingWindowFeature(
            np.zeros((2 * sr, 1), np.float32),
            SlidingWindow(start=0.0, duration=1.0 / sr, step=1.0 / sr),
        )
        # interactive pause is a no-op under Agg; patch it out for speed
        plt.pause = lambda *_: None
        plot.on_next((pred, audio, 2.0))
        plot.on_next((pred, audio, 2.5))
        assert plot.figure is not None
        assert plot.num_axs == 3  # output, audio, reference
        titles = [ax.get_title() for ax in plot.axs]
        assert titles == ["Output", "Audio", "Reference"]
        # prediction was aligned to the reference labels via optimal mapping
        assert "alice" in [t.get_text() for t in plot.axs[0].get_yticklabels()]
        plt.close(plot.figure)


class TestFeatureFormatter:
    def test_container_roundtrip(self):
        """SWF / numpy / jax inputs cast to (batch, frames, dims) and restore
        their original container (reference features.py semantics)."""
        import jax.numpy as jnp

        from diart_tpu.core.segment import SlidingWindow, SlidingWindowFeature
        from diart_tpu.features import TemporalFeatureFormatter

        fmt = TemporalFeatureFormatter()
        res = 0.01
        swf = SlidingWindowFeature(
            np.arange(20, dtype=np.float32).reshape(10, 2),
            SlidingWindow(start=3.0, duration=res, step=res),
        )
        cast = fmt.cast(swf)
        assert cast.shape == (1, 10, 2)
        out = fmt.restore_type(cast * 2)
        assert isinstance(out, SlidingWindowFeature)
        assert out.sliding_window.start == 3.0
        np.testing.assert_allclose(out.data, swf.data * 2)

        arr = np.ones((4, 3), np.float32)
        cast = fmt.cast(arr)
        assert cast.shape == (1, 4, 3)
        assert isinstance(fmt.restore_type(cast), np.ndarray)

        jarr = jnp.ones((2, 4, 3))
        assert fmt.cast(jarr).shape == (2, 4, 3)

    def test_torch_tensor_roundtrip(self):
        """A migrating reference user passes torch tensors; they cast to the
        device and restore as torch tensors (reference
        PytorchTensorFormatterState semantics)."""
        torch = pytest.importorskip("torch")
        from diart_tpu.features import TemporalFeatureFormatter

        fmt = TemporalFeatureFormatter()
        t = torch.arange(12, dtype=torch.float32).reshape(4, 3)
        cast = fmt.cast(t)
        assert cast.shape == (1, 4, 3)
        out = fmt.restore_type(cast + 1)
        assert isinstance(out, torch.Tensor)
        np.testing.assert_allclose(out.numpy(), t.numpy()[None] + 1)

    def test_unequal_window_rejected(self):
        from diart_tpu.core.segment import SlidingWindow, SlidingWindowFeature
        from diart_tpu.features import TemporalFeatureFormatter

        swf = SlidingWindowFeature(
            np.zeros((5, 1), np.float32),
            SlidingWindow(start=0.0, duration=0.02, step=0.01),
        )
        with pytest.raises(AssertionError, match="duration and step"):
            TemporalFeatureFormatter().cast(swf)


class TestAdjustVolume:
    def test_normalizes_to_target_db(self):
        from diart_tpu.blocks import AdjustVolume

        rng = np.random.default_rng(0)
        quiet = (0.01 * rng.normal(size=(1, 16000, 1))).astype(np.float32)
        out = np.asarray(AdjustVolume(-20.0)(quiet))
        db = 10 * np.log10(np.mean(out**2))
        assert db == pytest.approx(-20.0, abs=0.5)

    def test_clipping_guard(self):
        from diart_tpu.blocks import AdjustVolume

        loud = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
        out = np.asarray(AdjustVolume(6.0)(loud[None, :, None]))
        assert np.abs(out).max() <= 1.0 + 1e-6
