"""Headline ledger drift guard (VERDICT r3 weak #4).

The repo's rule is ONE source of truth for headline figures: the
current-defaults campaign artifacts are parsed into
``docs/campaigns/HEADLINE.json`` and README's generated blocks are spliced
from it (``scripts/update_headline.py``). This test runs the script's
``--check`` mode so any hand-edit of the README blocks — or a ledger that
no longer matches the committed artifacts — fails the suite instead of
shipping a third number in flight.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


def test_readme_headline_matches_campaign_artifacts():
    ledger = REPO / "docs" / "campaigns" / "HEADLINE.json"
    if not ledger.exists():
        pytest.skip("no HEADLINE.json yet (campaign not landed)")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "update_headline.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        "README headline blocks / HEADLINE.json are stale vs the campaign "
        f"artifacts — rerun scripts/update_headline.py:\n{proc.stdout}{proc.stderr}"
    )


def test_parse_stats_line_repeat_artifact():
    """--repeat artifacts carry one stats line per run plus a noise_band
    summary; the parser must pick the MEDIAN run (matching the headline
    bench.py prints) and attach the band spread. --ab artifacts (two legs,
    no band) must still be refused."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "update_headline", REPO / "scripts" / "update_headline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    line = (
        "# [run{n}] batch=256 mesh=1 seg=pyannet emb=xvector vad=False "
        "shared_frontend=False int16=False dtype=f32 emb_dtype=bf16 "
        "t_step_median={wall}ms t_step_best=12.47ms streams_best=10268 "
        "p50_chunk_latency=69.86ms p99_chunk_latency=80.74ms "
        "p99_device_est=50.59ms contended_windows=0/5 t_device_est={dev}ms "
        "sync_overhead=58.24ms transfer_inclusive=318.6ms/402streams "
        'precision={{"pallas_lstm": true}} device=TPU'
    )
    runs = [
        line.format(n=1, wall=13.09, dev=11.77),
        line.format(n=2, wall=12.63, dev=11.46),
        line.format(n=3, wall=12.73, dev=11.62),
    ]
    band = (
        "# noise_band runs=3 t_device_est_ms=[11.46, 11.62, 11.77] "
        "median=11.62 spread=+/-0.15 t_step_median_ms=[12.63, 12.73, 13.09]"
    )
    stats = mod.parse_stats_line("\n".join(runs + [band]))
    assert stats["t_step_median"] == "12.73ms"  # the median run
    assert stats["t_device_est"] == "11.62ms"
    assert stats["device_ms_spread"] == 0.15
    assert stats["precision"] == {"pallas_lstm": True}

    # single-run artifacts unchanged
    one = mod.parse_stats_line(runs[0])
    assert one["t_step_median"] == "13.09ms"
    assert "device_ms_spread" not in one

    # --ab artifacts (multiple lines, no band) still refused
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mod.parse_stats_line("\n".join(runs[:2]))
