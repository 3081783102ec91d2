"""Regenerate the golden RTTM fixtures (the hermetic analogue of the
reference's ``expected_outputs/`` regression corpus, SURVEY.md §4).

Run from the repo root:  python tests/make_golden.py
"""

from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, str(Path(__file__).parent))

from golden_config import (  # noqa: E402
    GOLDEN_LATENCIES,
    GRID_LATENCIES,
    run_golden,
    run_golden_grid,
)


def main():
    out_dir = Path(__file__).parent / "golden"
    out_dir.mkdir(exist_ok=True)
    for latency in GOLDEN_LATENCIES:
        rttm = run_golden(latency)
        path = out_dir / f"synth_latency{latency}.rttm"
        path.write_text(rttm)
        print(f"wrote {path}")
    for latency in GRID_LATENCIES:
        rttm = run_golden_grid(latency)
        path = out_dir / f"synth5s_latency{latency}.rttm"
        path.write_text(rttm)
        print(f"wrote {path}")
    rttm = run_golden_grid(5.0, tuned=True)
    path = out_dir / "synth5s_tuned_latency5.0.rttm"
    path.write_text(rttm)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
