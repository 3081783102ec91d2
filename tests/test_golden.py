"""Golden regression tests: the hermetic pipeline must keep producing the
committed RTTM outputs (the analogue of the reference's ``expected_outputs/``
corpus used for reproducibility checks, SURVEY.md §4)."""

import io
from pathlib import Path

import pytest

from diart_tpu.core import load_rttm
from diart_tpu.metrics import DiarizationErrorRate

from golden_config import GOLDEN_LATENCIES, GRID_LATENCIES, run_golden, run_golden_grid

GOLDEN_DIR = Path(__file__).parent / "golden"


def _assert_matches(fixture: str, current_text: str):
    path = GOLDEN_DIR / fixture
    assert path.exists(), "run tests/make_golden.py to generate fixtures"
    golden_text = path.read_text()

    if current_text == golden_text:
        return  # bit-exact

    # tolerate only float-noise-level drift (different BLAS/ISA): score the
    # regenerated output against the golden as if it were a reference
    def parse(text):
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".rttm", delete=False) as f:
            f.write(text)
            name = f.name
        return next(iter(load_rttm(name).values()))

    der = DiarizationErrorRate()
    drift = der(parse(golden_text), parse(current_text))
    assert drift < 0.005, f"golden drift DER={drift:.4f} for {fixture}"


@pytest.mark.parametrize("latency", GOLDEN_LATENCIES)
def test_matches_golden(latency):
    _assert_matches(f"synth_latency{latency}.rttm", run_golden(latency))


@pytest.mark.parametrize("latency", GRID_LATENCIES)
def test_matches_golden_grid(latency):
    """The reference's full published latency grid on the flagship 5 s
    geometry (``expected_outputs/online/{0.5s..5.0s}``, README.md:433-437) —
    pins the latency-dependent aggregation/prepend/timestamp semantics."""
    _assert_matches(f"synth5s_latency{latency}.rttm", run_golden_grid(latency))


def test_matches_golden_grid_tuned():
    """Tuned-hyperparameter scenario (the reference's AMI-tuned values)."""
    _assert_matches(
        "synth5s_tuned_latency5.0.rttm", run_golden_grid(5.0, tuned=True)
    )
