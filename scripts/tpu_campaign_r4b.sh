#!/bin/bash
# Round-4 campaign, part 2: resume after the session crash that killed
# tpu_campaign_r4.sh between the powerset and ecapa rows (flagship and
# powerset completed; their artifacts are already merged into
# docs/campaigns/r4/). Finishes the per-family headline rows + the int16
# ingestion A/B, then the two end-to-end measurements VERDICT r3 asked
# for: the served websocket path (serve_bench) and multi-stream tuning
# throughput (tune_bench). Sequential on purpose: the dev chip is
# time-shared and only back-to-back runs are comparable.
#
# After it finishes:
#   python scripts/update_headline.py        # artifacts -> HEADLINE.json -> README
set -u
cd /root/repo
LOG=.bench_logs
ART=docs/campaigns/r4
mkdir -p "$LOG" "$ART"

run() {
  local name=$1
  shift
  echo "=== $name start $(date -u +%H:%M:%S) :: $*" >> "$LOG/campaign.log"
  timeout 5400 "$@" > "$LOG/$name.out" 2> "$LOG/$name.err"
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
  # one artifact per row: stats line(s) from stderr + JSON line(s) from stdout
  cat "$LOG/$name.err" "$LOG/$name.out" > "$ART/$name.txt"
}

# remaining current-default per-family rows (flagship/powerset done in part 1)
run r4_ecapa     python bench.py 256 40 --emb ecapa
run r4_resnet34  python bench.py 256 40 --emb resnet34
run r4_titanet   python bench.py 256 40 --emb titanet
run r4_xvect_sb  python bench.py 256 40 --emb xvect-sb
run r4_vad       python bench.py 256 40 --vad

# int16 PCM ingestion A/B (one process, f32 blocks vs int16 blocks)
run r4_int16_ab  python bench.py 256 20 --ab --int16

# end-to-end served path: N websocket clients -> StreamingServer -> engine
run r4_serve     python scripts/serve_bench.py

# multi-stream tuning throughput: shared-executable vs per-trial rebuild
run r4_tune      python scripts/tune_bench.py

echo "=== campaign r4b done $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
