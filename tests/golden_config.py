"""Shared definition of the golden regression scenario."""

from fakes import SAMPLE_RATE, Turn, fake_embedding, fake_segmentation, synth_audio

GOLDEN_TURNS = [
    Turn(0.0, 2.0, 0),
    Turn(2.5, 4.5, 1),
    Turn(5.0, 8.0, 0),
    Turn(6.5, 9.0, 2),  # overlap
    Turn(9.5, 11.0, 1),
]
TOTAL = 12.0
GOLDEN_LATENCIES = (0.5, 2.0)


def run_golden(latency: float) -> str:
    """Run the hermetic diarization pipeline at a given latency; return the
    final patched RTTM text."""
    import numpy as np

    from diart_tpu import SpeakerDiarization, SpeakerDiarizationConfig
    from diart_tpu.runtime import FileAudioSource, StreamingInference
    from diart_tpu.audio import write_wav
    import tempfile
    from pathlib import Path

    config = SpeakerDiarizationConfig(
        segmentation=fake_segmentation(),
        embedding=fake_embedding(),
        duration=2.0,
        step=0.5,
        latency=latency,
        tau_active=0.6,
        rho_update=0.1,
        delta_new=0.7,
        max_speakers=8,
        sample_rate=SAMPLE_RATE,
    )
    pipeline = SpeakerDiarization(config)
    with tempfile.TemporaryDirectory() as tmp:
        wav = Path(tmp) / "synth.wav"
        write_wav(wav, synth_audio(GOLDEN_TURNS, TOTAL, seed=123), SAMPLE_RATE)
        padding = config.get_file_padding(wav)
        source = FileAudioSource(wav, SAMPLE_RATE, padding, config.step)
        pipeline.set_timestamp_shift(-padding[0])
        inference = StreamingInference(
            pipeline, source, batch_size=1, do_profile=False, show_progress=False
        )
        prediction = inference()
    prediction.uri = "synth"
    return prediction.to_rttm()
