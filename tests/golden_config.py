"""Shared definition of the golden regression scenarios.

Two scenario families, mirroring the reference's ``expected_outputs/online/
{0.5s..5.0s}`` latency grid (``/root/reference/README.md:433-437``):

* the original 2 s-window scenario (latencies 0.5 / 2.0) — kept verbatim so
  the round-1 fixtures stay pinned;
* the GRID scenario: the flagship 5 s / 0.5 s geometry at every latency the
  reference publishes goldens for (0.5, 1, 2, 3, 4, 5 s), plus one
  tuned-hyperparameter variant (the reference's AMI-tuned values,
  ``README.md:386-394``) — these pin the aggregation focus, first-chunk
  prepend, and timestamp-shift semantics that all vary with latency
  (SURVEY.md §7 hard part 3).
"""

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

# Longer scenario for the 5 s-window grid: the file must comfortably exceed
# the window so every latency setting has a steady-state region to aggregate.
GRID_TURNS = [
    Turn(0.0, 3.0, 0),
    Turn(3.5, 6.0, 1),
    Turn(7.0, 11.0, 0),
    Turn(9.5, 12.5, 2),  # overlap
    Turn(13.0, 15.5, 1),
    Turn(16.0, 17.5, 0),
]
GRID_TOTAL = 18.0
GRID_LATENCIES = (0.5, 1.0, 2.0, 3.0, 4.0, 5.0)
# The reference's AMI-tuned hyperparameters (README.md:386-394).
TUNED_HPARAMS = {"tau_active": 0.507, "rho_update": 0.006, "delta_new": 1.057}


def _run(turns, total, duration, latency, seed, **hparams) -> str:
    """Run the hermetic diarization pipeline; return the patched RTTM text."""
    import tempfile
    from pathlib import Path

    from diart_tpu import SpeakerDiarization, SpeakerDiarizationConfig
    from diart_tpu.audio import write_wav
    from diart_tpu.runtime import FileAudioSource, StreamingInference

    config = SpeakerDiarizationConfig(
        segmentation=fake_segmentation(),
        embedding=fake_embedding(),
        duration=duration,
        step=0.5,
        latency=latency,
        max_speakers=8,
        sample_rate=SAMPLE_RATE,
        **hparams,
    )
    pipeline = SpeakerDiarization(config)
    with tempfile.TemporaryDirectory() as tmp:
        wav = Path(tmp) / "synth.wav"
        write_wav(wav, synth_audio(turns, total, seed=seed), SAMPLE_RATE)
        padding = config.get_file_padding(wav)
        source = FileAudioSource(wav, SAMPLE_RATE, padding, config.step)
        pipeline.set_timestamp_shift(-padding[0])
        inference = StreamingInference(
            pipeline, source, batch_size=1, do_profile=False, show_progress=False
        )
        prediction = inference()
    prediction.uri = "synth"
    return prediction.to_rttm()


def run_golden(latency: float) -> str:
    """The original 2 s-window scenario (round-1 fixtures)."""
    return _run(
        GOLDEN_TURNS,
        TOTAL,
        duration=2.0,
        latency=latency,
        seed=123,
        tau_active=0.6,
        rho_update=0.1,
        delta_new=0.7,
    )


def run_golden_grid(latency: float, tuned: bool = False) -> str:
    """The flagship-geometry (5 s / 0.5 s) scenario across the reference's
    latency grid; ``tuned=True`` applies the AMI-tuned hyperparameters."""
    hparams = (
        dict(TUNED_HPARAMS)
        if tuned
        else {"tau_active": 0.6, "rho_update": 0.3, "delta_new": 1.0}
    )
    return _run(
        GRID_TURNS, GRID_TOTAL, duration=5.0, latency=latency, seed=321, **hparams
    )
