"""End-to-end execution of host-only (ONNX-contract) models through the
pipelines (VERDICT r1 item 3).

The reference runs ONNX segmentation/embedding inside the full pipeline
(``/root/reference/src/diart/models.py:62-109``). Here host-only models are
any LazyModel whose params is None and whose module is a host callable —
exactly the ONNX wrapper contract (``diart_tpu/models/onnx.py``) — so the
fallback is testable without onnxruntime; a real exported-ONNX test runs
when onnxruntime is installed.
"""

import numpy as np
import pytest

from diart_tpu import (
    SpeakerDiarization,
    SpeakerDiarizationConfig,
    VoiceActivityDetection,
    VoiceActivityDetectionConfig,
)
from diart_tpu.models import EmbeddingModel, SegmentationModel
from fakes import SAMPLE_RATE, Turn, fake_embedding, fake_segmentation, synth_audio
from golden_config import GOLDEN_TURNS, TOTAL

PIPE = dict(
    duration=2.0,
    step=0.5,
    latency=0.5,
    tau_active=0.6,
    rho_update=0.1,
    delta_new=0.7,
    max_speakers=8,
    sample_rate=SAMPLE_RATE,
)


def _host_versions():
    """Host-only twins of the fake tone-oracle models: same math, but params
    None + host-callable module (the ONNX wrapper contract)."""
    import jax.numpy as jnp

    jax_seg = fake_segmentation()
    jax_seg.load()
    seg_fn = jax_seg.module.apply

    class HostSeg:
        num_speakers = jax_seg.num_speakers

        def __call__(self, wave):
            return np.asarray(seg_fn({}, jnp.asarray(np.asarray(wave))))

    jax_emb = fake_embedding()
    jax_emb.load()
    emb_module = jax_emb.module

    class HostEmb:
        embedding_dim = jax_emb.embedding_dim

        def __call__(self, wave, weights):
            # reference ONNX convention: (N*K, ch, S) + (N*K, T) -> (N*K, E)
            out = emb_module.apply(
                {}, jnp.asarray(np.asarray(wave)), jnp.asarray(np.asarray(weights))[:, None, :]
            )
            return np.asarray(out[:, 0])

    host_seg = SegmentationModel(lambda: (HostSeg(), None, {"sample_rate": SAMPLE_RATE}))
    host_emb = EmbeddingModel(lambda: (HostEmb(), None, {"sample_rate": SAMPLE_RATE}))
    return host_seg, host_emb


def _run(pipeline, audio):
    """Feed 2 s windows every 0.5 s; collect binarized annotations."""
    from diart_tpu.core.segment import SlidingWindow, SlidingWindowFeature

    audio = audio[0]  # synth_audio returns (1, samples)
    chunk = int(PIPE["duration"] * SAMPLE_RATE)
    hop = int(PIPE["step"] * SAMPLE_RATE)
    res = 1.0 / SAMPLE_RATE
    outputs = []
    for start in range(0, audio.shape[0] - chunk + 1, hop):
        sw = SlidingWindow(start=start / SAMPLE_RATE, duration=res, step=res)
        window = SlidingWindowFeature(audio[start : start + chunk, None], sw)
        outputs.extend(pipeline([window]))
    return outputs


class TestHostModelFallback:
    def test_diarization_matches_jitted_path(self):
        audio = synth_audio(GOLDEN_TURNS, TOTAL)
        ref_pipe = SpeakerDiarization(
            SpeakerDiarizationConfig(
                segmentation=fake_segmentation(), embedding=fake_embedding(), **PIPE
            )
        )
        host_seg, host_emb = _host_versions()
        host_pipe = SpeakerDiarization(
            SpeakerDiarizationConfig(segmentation=host_seg, embedding=host_emb, **PIPE)
        )
        ref_out = _run(ref_pipe, audio)
        host_out = _run(host_pipe, audio)
        assert len(ref_out) == len(host_out) > 0
        ref_rttm = "".join(a.to_rttm() for a, _ in ref_out)
        host_rttm = "".join(a.to_rttm() for a, _ in host_out)
        assert ref_rttm == host_rttm
        assert "SPEAKER" in ref_rttm  # non-degenerate

    def test_mixed_native_seg_host_emb(self):
        audio = synth_audio(GOLDEN_TURNS, TOTAL)
        _, host_emb = _host_versions()
        pipe = SpeakerDiarization(
            SpeakerDiarizationConfig(
                segmentation=fake_segmentation(), embedding=host_emb, **PIPE
            )
        )
        out = _run(pipe, audio)
        assert any("SPEAKER" in a.to_rttm() for a, _ in out)

    def test_vad_host_fallback(self):
        audio = synth_audio(GOLDEN_TURNS, TOTAL)
        host_seg, _ = _host_versions()
        cfg = dict(PIPE)
        for key in ("rho_update", "delta_new", "max_speakers"):
            cfg.pop(key)
        ref = VoiceActivityDetection(
            VoiceActivityDetectionConfig(segmentation=fake_segmentation(), **cfg)
        )
        host = VoiceActivityDetection(
            VoiceActivityDetectionConfig(segmentation=host_seg, **cfg)
        )
        ref_rttm = "".join(a.to_rttm() for a, _ in _run(ref, audio))
        host_rttm = "".join(a.to_rttm() for a, _ in _run(host, audio))
        assert ref_rttm == host_rttm and "speech" in ref_rttm

    def test_engine_rejects_host_models(self):
        from diart_tpu.parallel import MultiStreamEngine

        host_seg, _ = _host_versions()
        with pytest.raises(RuntimeError, match="pipeline path"):
            MultiStreamEngine(
                segmentation=host_seg, duration=1.0, step=0.5, latency=0.5,
                sample_rate=SAMPLE_RATE, batch_size=1,
            )


class TestRealOnnx:
    def test_exported_onnx_through_streaming_inference(self, tmp_path):
        """Export a tiny torch model to ONNX and stream a file through
        StreamingInference (skips when onnxruntime is unavailable)."""
        pytest.importorskip("onnxruntime")
        import torch

        class Tiny(torch.nn.Module):
            def forward(self, waveform):
                # (B, 1, S) -> (B, S // 160, 2)
                x = waveform[:, 0]
                frames = x.reshape(x.shape[0], -1, 160).abs().mean(-1, keepdim=True)
                return torch.cat([frames, 1.0 - frames], dim=-1).clamp(0, 1)

        path = tmp_path / "tiny.onnx"
        torch.onnx.export(
            Tiny(),
            (torch.zeros(1, 1, SAMPLE_RATE),),
            str(path),
            input_names=["waveform"],
            output_names=["segmentation"],
            dynamic_axes={"waveform": {0: "batch"}},
        )
        from diart_tpu.audio import write_wav
        from diart_tpu.runtime import FileAudioSource, StreamingInference

        audio = synth_audio([Turn(0.5, 2.5, 0)], 4.0)  # (1, samples)
        wav = tmp_path / "a.wav"
        write_wav(wav, audio, SAMPLE_RATE)
        seg = SegmentationModel.from_onnx(str(path))
        cfg = dict(PIPE)
        for key in ("rho_update", "delta_new", "max_speakers"):
            cfg.pop(key)
        pipeline = VoiceActivityDetection(
            VoiceActivityDetectionConfig(segmentation=seg, **cfg)
        )
        source = FileAudioSource(wav, SAMPLE_RATE, block_duration=PIPE["step"])
        pred = StreamingInference(pipeline, source, show_progress=False, do_profile=False)()
        assert pred is not None
