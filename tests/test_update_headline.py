"""Unit tests for the headline-ledger machinery (scripts/update_headline.py).

The ledger is the single source of truth for README's headline figures
(VERDICT r3 weak #4); these tests pin its parsing of bench.py artifacts and
the sentinel splice so a format drift in either direction fails the suite
before it silently corrupts the README.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent

spec = importlib.util.spec_from_file_location(
    "update_headline", REPO / "scripts" / "update_headline.py"
)
uh = importlib.util.module_from_spec(spec)
sys.modules["update_headline"] = uh
spec.loader.exec_module(uh)

STATS_LINE = (
    "# batch=256 mesh=1 seg=pyannet emb=xvector vad=False "
    "shared_frontend=False int16=False dtype=f32 emb_dtype=bf16 "
    "t_step_median=12.95ms t_step_best=12.79ms streams_best=10005 "
    "p50_chunk_latency=63.68ms p99_chunk_latency=65.64ms "
    "p99_device_est=38.88ms contended_windows=0/5 t_device_est=11.91ms "
    "sync_overhead=51.77ms transfer_inclusive=250.0ms/512streams "
    "(tunnel-bound) flops/step=6.805e+11 tflops_per_s=52.5 pct_peak=26.7% "
    'precision={"pallas_lstm": true, "fbank_ring": true} device=TPU v5 lite'
)
JSON_LINE = (
    '{"metric": "realtime_streams_per_chip", "value": 9883.6, '
    '"unit": "streams", "vs_baseline": 988.36}'
)


def test_parse_stats_line_fields_and_precision():
    stats = uh.parse_stats_line("WARNING: noise\n" + STATS_LINE + "\n")
    assert stats["batch"] == "256"
    assert uh._num(stats, "t_step_median") == 12.95
    assert uh._num(stats, "t_device_est") == 11.91
    assert uh._num(stats, "p99_device_est") == 38.88
    assert stats["precision"] == {"pallas_lstm": True, "fbank_ring": True}


def test_parse_stats_line_refuses_ab_artifacts():
    """--ab artifacts carry two stats lines (A=baseline, B=variant); a
    blind parse would pair one leg's stats with the other leg's headline
    JSON, so the ledger refuses them — rows must be single-run."""
    a = STATS_LINE.replace("t_device_est=11.91ms", "t_device_est=99.99ms")
    with pytest.raises(ValueError, match="single-run"):
        uh.parse_stats_line(a + "\n" + STATS_LINE)


def test_parse_headline_json():
    out = uh.parse_headline_json("# noise\n" + JSON_LINE + "\n")
    assert out["value"] == 9883.6


def test_parse_stats_line_raises_without_stats():
    with pytest.raises(ValueError):
        uh.parse_stats_line("no stats here\n")


def test_build_row_from_artifact(tmp_path):
    # artifact names are <dirname>_<stem>.txt so one ROWS table re-points
    # to any round's campaign directory
    (tmp_path / f"{tmp_path.name}_flagship.txt").write_text(
        STATS_LINE + "\n" + JSON_LINE
    )
    rows = uh.build(tmp_path)
    r = rows["flagship"]
    assert r["streams"] == 9883.6
    assert r["device_ms"] == 11.91
    assert r["batch"] == 256
    assert r["mfu_pct"] == 26.7
    # headline + table render from a flagship-only row set without error
    assert "9,884 real-time streams" in uh.render_headline(rows)
    assert "| PyanNet + XVectorSincNet |" in uh.render_table(rows)


def test_splice_replaces_between_sentinels():
    text = (
        "before\n<!-- x:begin (generated) -->\nOLD\n<!-- x:end -->\nafter\n"
    )
    out = uh.splice(text, "x", "NEW")
    assert "OLD" not in out and "NEW" in out
    assert out.startswith("before\n") and out.endswith("after\n")
    # idempotent: splicing the same payload again changes nothing
    assert uh.splice(out, "x", "NEW") == out
