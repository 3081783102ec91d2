#!/bin/bash
# Round-4 campaign: refresh every headline row at the CURRENT defaults
# (fbank_ring now ON), plus the int16 ingestion A/B. Sequential on
# purpose: the dev chip is time-shared, and only back-to-back runs are
# comparable. After it finishes:
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
  # the committed artifact update_headline.py reads (stderr stats + stdout JSON)
  cat "$LOG/$name.err" "$LOG/$name.out" > "$ART/$name.txt"
}

# current-default per-family rows (these become HEADLINE.json / README)
run r4_flagship  python bench.py 256 100 --emb xvector
run r4_powerset  python bench.py 256 40 --seg powerset
run r4_ecapa     python bench.py 256 40 --emb ecapa
run r4_resnet34  python bench.py 256 40 --emb resnet34
run r4_titanet   python bench.py 256 40 --emb titanet
run r4_xvect_sb  python bench.py 256 40 --emb xvect-sb
run r4_vad       python bench.py 256 40 --vad

# int16 PCM ingestion A/B (one process, f32 blocks vs int16 blocks)
run r4_int16_ab  python bench.py 256 20 --ab --int16

echo "=== campaign r4 done $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
