"""Console entry-point smoke tests (the hermetic analogue of the reference's
CI quick-runs, SURVEY.md §4): real subprocesses, real CLIs, synthetic audio,
native registry models."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from fakes import SAMPLE_RATE, Turn, synth_audio  # noqa: E402

from diart_tpu.audio import write_wav  # noqa: E402
from diart_tpu.core import load_rttm, write_rttm  # noqa: E402

REPO = Path(__file__).parent.parent


def run_cli(module, *args, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.run(
        [sys.executable, "-m", f"diart_tpu.console.{module}", *map(str, args)],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "meeting.wav"
    turns = [Turn(0.0, 2.0, 0), Turn(2.5, 5.0, 1)]
    write_wav(path, synth_audio(turns, 6.0), SAMPLE_RATE)
    return path


def test_stream_cli_writes_rttm(wav_file, tmp_path):
    result = run_cli(
        "stream",
        wav_file,
        "--no-plot",
        "--cpu",
        "--duration", "1",
        "--step", "0.5",
        "--latency", "0.5",
        "--max-speakers", "6",
        "--output", tmp_path,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    rttm = tmp_path / "meeting.rttm"
    assert rttm.exists()
    # random-weight models give arbitrary predictions; the contract here is a
    # well-formed RTTM covering the file timeline
    text = rttm.read_text()
    for line in text.splitlines():
        parts = line.split()
        assert parts[0] == "SPEAKER" and parts[1] == "meeting"


def test_benchmark_cli_report(wav_file, tmp_path):
    audio_dir = tmp_path / "audio"
    rttm_dir = tmp_path / "rttm"
    out_dir = tmp_path / "out"
    audio_dir.mkdir()
    rttm_dir.mkdir()
    import shutil

    shutil.copy(wav_file, audio_dir / "meeting.wav")
    from fakes import turns_to_annotation

    write_rttm(
        turns_to_annotation([Turn(0.0, 2.0, 0), Turn(2.5, 5.0, 1)], "meeting"),
        rttm_dir / "meeting.rttm",
    )
    result = run_cli(
        "benchmark",
        audio_dir,
        "--reference", rttm_dir,
        "--output", out_dir,
        "--cpu",
        "--duration", "1",
        "--step", "0.5",
        "--latency", "0.5",
        "--max-speakers", "6",
        "--batch-size", "4",
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert (out_dir / "meeting.rttm").exists()
    assert (out_dir / "benchmark_report.csv").exists()
    assert "diarization error rate" in result.stdout


def test_serve_client_cli_end_to_end(wav_file):
    """diart-tpu-serve + diart-tpu-client as real subprocesses: the client
    streams the wav over the websocket and must get RTTM lines back (the
    reference CI's serve smoke has no analogue — it never tests serving)."""
    import socket
    import time

    # ephemeral port so a concurrent run or stale server can't satisfy the
    # readiness probe in our place
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    server = subprocess.Popen(
        [
            sys.executable, "-m", "diart_tpu.console.serve",
            "--cpu",
            "--port", str(port),
            "--num-streams", "2",
            "--duration", "1",
            "--step", "0.5",
            "--latency", "0.5",
            "--max-speakers", "6",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
        cwd=REPO,
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), 1).close()
                break
            except OSError:
                if server.poll() is not None:
                    pytest.fail(
                        f"server exited early: {server.stderr.read()[-2000:]}"
                    )
                time.sleep(0.5)
        else:
            pytest.fail("server never listened")
        result = run_cli(
            "client", wav_file,
            "--host", "127.0.0.1",
            "--port", port,
            "--step", "0.5",
        )
        assert result.returncode == 0, result.stderr[-2000:]
        lines = [l for l in result.stdout.splitlines() if l.strip()]
        assert lines and all(l.split()[0] == "SPEAKER" for l in lines)
    finally:
        server.terminate()
        try:
            server.wait(timeout=10)
        except subprocess.TimeoutExpired:
            server.kill()


def test_convert_cli_roundtrip(tmp_path):
    """diart-tpu-convert: torch checkpoint -> native .msgpack, reloadable."""
    import subprocess
    import sys


    import torch
    from torch_replicas import TorchPyanNet

    torch.manual_seed(50)
    ckpt = tmp_path / "seg.pt"
    torch.save(
        TorchPyanNet(num_speakers=3, lstm_hidden=16, lstm_layers=1,
                     linear_dims=(16,)).eval().state_dict(),
        ckpt,
    )
    out = tmp_path / "seg.msgpack"
    result = run_cli(
        "convert", "segmentation", str(ckpt), str(out), "--check"
    )
    assert result.returncode == 0, result.stderr[-500:]
    assert "check ok" in result.stdout
    assert out.exists() and out.with_suffix(".msgpack.json").exists()
