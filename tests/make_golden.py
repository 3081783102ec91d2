"""Regenerate the golden RTTM fixtures (the hermetic analogue of the
reference's ``expected_outputs/`` regression corpus, SURVEY.md §4).

Run from the repo root:  python tests/make_golden.py
"""

from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, str(Path(__file__).parent))

from golden_config import GOLDEN_LATENCIES, GOLDEN_TURNS, TOTAL, run_golden  # noqa: E402


def main():
    out_dir = Path(__file__).parent / "golden"
    out_dir.mkdir(exist_ok=True)
    for latency in GOLDEN_LATENCIES:
        rttm = run_golden(latency)
        path = out_dir / f"synth_latency{latency}.rttm"
        path.write_text(rttm)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
