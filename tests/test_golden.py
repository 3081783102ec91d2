"""Golden regression tests: the hermetic pipeline must keep producing the
committed RTTM outputs (the analogue of the reference's ``expected_outputs/``
corpus used for reproducibility checks, SURVEY.md §4)."""

import io
from pathlib import Path

import pytest

from diart_tpu.core import load_rttm
from diart_tpu.metrics import DiarizationErrorRate

from golden_config import GOLDEN_LATENCIES, run_golden

GOLDEN_DIR = Path(__file__).parent / "golden"


@pytest.mark.parametrize("latency", GOLDEN_LATENCIES)
def test_matches_golden(latency):
    path = GOLDEN_DIR / f"synth_latency{latency}.rttm"
    assert path.exists(), "run tests/make_golden.py to generate fixtures"
    golden_text = path.read_text()
    current_text = run_golden(latency)

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
    assert drift < 0.005, f"golden drift DER={drift:.4f} at latency {latency}"
