#!/bin/bash
# Round-3 campaign, part B: the phase-major audio ring and the fast_fbank
# mel precision switch, measured on the chip.
#   - phased ring A/B on the flagship (and VAD): default ON vs OFF
#   - fast_fbank A/B per mel family: default OFF vs ON
#   - fast_fbank embedding-cosine fidelity per mel family
# Sequential on purpose: the dev chip is time-shared, and only back-to-back
# runs are comparable. Logs land in .bench_logs/.
set -u
cd /root/repo
LOG=.bench_logs
mkdir -p "$LOG"

run() {
  local name=$1
  shift
  echo "=== $name start $(date -u +%H:%M:%S) :: $*" >> "$LOG/campaign.log"
  timeout 5400 "$@" > "$LOG/$name.out" 2> "$LOG/$name.err"
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
}

# phased_ab_xvector / phased_ab_vad: completed 06:28-06:41 (results archived
# in docs/campaigns/r3/phased_ab_{xvector,vad}.txt); the session hosting the
# campaign died mid-fastfbank, so the remaining steps rerun from here.
run fastfbank_ab_ecapa python bench.py 256 20 --emb ecapa --ab --set fast_fbank=1
run fastfbank_ab_resnet34 python bench.py 256 20 --emb resnet34 --ab --set fast_fbank=1
run fastfbank_ab_titanet python bench.py 256 20 --emb titanet --ab --set fast_fbank=1
run fastfbank_ab_xvect_sb python bench.py 256 20 --emb xvect-sb --ab --set fast_fbank=1

run fbank_fidelity python scripts/fbank_fidelity.py

echo "=== campaign r3b done $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
