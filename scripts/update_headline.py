"""One source of truth for headline numbers.

Parses the current-defaults campaign artifacts (``r4_<row>.txt`` stats
lines as ``bench.py`` prints them), writes the canonical
``docs/campaigns/HEADLINE.json``, and rewrites the generated blocks of
README.md between ``<!-- headline:begin -->`` / ``<!-- family-table:begin
-->`` sentinels — so README, PERF.md (which cites HEADLINE.json), and the
BENCH artifact can never drift apart again (VERDICT r3 weak #4: three
different flagship figures were in flight at once).

Usage:
    python scripts/update_headline.py [--artifacts docs/campaigns/r4]
    python scripts/update_headline.py --check   # verify README is current
"""

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# README table rows: artifact stem -> (pipeline label, batch-1 figure,
# reference-GPU column). Artifact file = <dir>/<dirname>_<stem>.txt (so the
# same rows re-point to any round's campaign via --artifacts). The batch-1
# medians were measured in the r3 campaign (PERF.md per-family table) and
# are not re-run per refresh.
ROWS = [
    ("flagship", "PyanNet + XVectorSincNet", "2.5 ms",
     "12 ms (pyannote/embedding)"),
    ("powerset", "PyanNet(powerset) + XVectorSincNet", "—",
     "8 ms (segmentation-3.0) + 12 ms"),
    ("ecapa", "PyanNet + ECAPA-TDNN", "2.5 ms",
     "14 ms (speechbrain ecapa)"),
    ("resnet34", "PyanNet + ResNet34", "3.0 ms",
     "29 ms torch / 15 ms ONNX (wespeaker)"),
    ("titanet", "PyanNet + TitaNet-L", "3.2 ms",
     "16 ms (nvidia titanet_large)"),
    ("xvect_sb", "PyanNet + XVector-SB (speechbrain fbank)", "1.9 ms",
     "41 ms CPU / 15 ms GPU (spkrec-xvect)"),
    ("vad", "VAD (PyanNet only)", "2.0 ms",
     "8 ms (pyannote/segmentation)"),
]

_STAT = re.compile(r"(\w+)=([^\s]+)")


def parse_stats_line(text: str) -> dict:
    """Parse the bench stats line of a ledger artifact. Single-run
    artifacts have ONE stats line. ``--repeat`` artifacts (the noise-band
    method) have one line per run plus a ``# noise_band`` summary — the
    MEDIAN run (by wall step median, matching the headline bench.py
    prints) is used and the band spread is attached as
    ``device_ms_spread``. ``--ab`` artifacts (two legs whose stats would
    mix) are refused; ledger rows are single-run or repeat-band by
    construction."""
    lines = [
        l
        for l in text.splitlines()
        if l.startswith("# ") and "t_step_median" in l and "batch=" in l
    ]
    if not lines:
        raise ValueError("no bench stats line found")
    band = re.search(r"# noise_band runs=\d+ .*spread=\+/-([\d.]+)", text)
    if len(lines) > 1:
        if band is None:
            raise ValueError(
                "multiple stats lines without a noise_band summary (an "
                "--ab artifact?) — ledger rows must be single-run or "
                "--repeat artifacts"
            )
        def wall(line):
            m = re.search(r"t_step_median=([\d.]+)ms", line)
            return float(m.group(1))
        lines.sort(key=wall)
        line = lines[len(lines) // 2]
    else:
        line = lines[0]
    stats = {}
    for k, v in _STAT.findall(line):
        stats[k] = v
    if band is not None:
        stats["device_ms_spread"] = float(band.group(1))
    # precision json is split by the \s tokenizer; recover it whole
    m = re.search(r"precision=(\{.*?\})", line)
    if m:
        stats["precision"] = json.loads(m.group(1))
    return stats


def _num(stats, key, strip="ms"):
    v = stats[key]
    if strip and v.endswith(strip):
        v = v[: -len(strip)]
    return float(v)


def parse_headline_json(text: str) -> dict:
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise ValueError("no bench JSON headline line found")


def build(artifacts: Path) -> dict:
    rows = {}
    for stem, label, batch1, ref in ROWS:
        path = artifacts / f"{artifacts.name}_{stem}.txt"
        if not path.exists():
            print(f"update_headline: missing {path}, skipping row", file=sys.stderr)
            continue
        text = path.read_text()
        stats = parse_stats_line(text)
        headline = parse_headline_json(text)
        rows[stem] = {
            "label": label,
            "wall_ms": _num(stats, "t_step_median"),
            "device_ms": _num(stats, "t_device_est"),
            "device_ms_spread": stats.get("device_ms_spread"),
            "streams": headline["value"],
            "streams_best": float(stats["streams_best"]),
            "p50_ms": _num(stats, "p50_chunk_latency"),
            "p99_ms": _num(stats, "p99_chunk_latency"),
            "p99_device_ms": (
                _num(stats, "p99_device_est") if "p99_device_est" in stats else None
            ),
            "mfu_pct": (
                float(stats["pct_peak"].rstrip("%")) if "pct_peak" in stats else None
            ),
            "batch": int(stats["batch"]),
            "batch1_step": batch1,
            "reference_gpu": ref,
            "precision": stats.get("precision"),
            "artifact": str(
                path.relative_to(REPO) if path.is_relative_to(REPO) else path
            ),
        }
    return rows


def render_headline(rows: dict) -> str:
    f = rows["flagship"]
    dev_streams = f["batch"] * 500.0 / f["device_ms"]
    spread = (
        f" ± {f['device_ms_spread']:.2f}"
        if f.get("device_ms_spread") is not None
        else ""
    )
    # bench.py omits pct_peak when the device kind has no peak figure;
    # render without the MFU clause rather than crash the refresh
    mfu = (
        f", at {f['mfu_pct']:.1f}% of v5e bf16 peak per the compiled "
        f"step's cost analysis"
        if f["mfu_pct"] is not None
        else ""
    )
    return (
        f"**{f['wall_ms']:.1f} ms wall / {f['device_ms']:.2f}{spread} ms "
        f"device-estimate per 0.5 s hop for {f['batch']} concurrent streams with "
        f"two *distinct* SincNet filterbanks — the real serving shape every "
        f"pretrained seg+emb pair produces — i.e. "
        f"*{f['streams']:,.0f} real-time streams per chip* as printed by "
        f"`python bench.py` ({f['streams']/10:,.0f}× the reference's 50 ms "
        f"per hop for a single stream on a V100, paper §5), "
        f"{dev_streams:,.0f} by device time{mfu} "
        f"(artifact: `{f['artifact']}`).**"
    )


def render_table(rows: dict) -> str:
    out = [
        "| Pipeline | step median (wall / device) | rt streams/chip | MFU | "
        "batch-1 full-pipeline step | reference GPU, model forward only |",
        "|---|---|---|---|---|---|",
    ]
    for stem, label, batch1, ref in ROWS:
        if stem not in rows:
            continue
        r = rows[stem]
        mfu = f"{r['mfu_pct']:.1f}%" if r["mfu_pct"] is not None else "—"
        out.append(
            f"| {label} | {r['wall_ms']:.1f} / {r['device_ms']:.1f} ms | "
            f"**{r['streams']:,.0f}** | {mfu} | {batch1} | {ref} |"
        )
    return "\n".join(out)


def splice(text: str, tag: str, payload: str) -> str:
    begin, end = f"<!-- {tag}:begin", f"<!-- {tag}:end -->"
    i = text.index(begin)
    i = text.index("-->", i) + 3
    j = text.index(end)
    return text[:i] + "\n" + payload + "\n" + text[j:]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifacts", default="docs/campaigns/r5")
    p.add_argument("--check", action="store_true",
                   help="exit 1 if README does not match the artifacts")
    args = p.parse_args()

    rows = build(REPO / args.artifacts)
    if "flagship" not in rows:
        sys.exit("update_headline: flagship artifact missing — nothing to do")
    ledger = REPO / "docs/campaigns/HEADLINE.json"
    payload = {"source": args.artifacts, "rows": rows}

    readme = REPO / "README.md"
    text = new = readme.read_text()
    new = splice(new, "headline", render_headline(rows))
    new = splice(new, "family-table", render_table(rows))
    if args.check:
        current = json.loads(ledger.read_text()) if ledger.exists() else None
        ok = new == text and current == payload
        print("README/HEADLINE.json up to date" if ok else "STALE")
        sys.exit(0 if ok else 1)
    ledger.write_text(json.dumps(payload, indent=1))
    readme.write_text(new)
    print(f"wrote {ledger.relative_to(REPO)} and README blocks "
          f"({len(rows)} rows)")


if __name__ == "__main__":
    main()
