#!/bin/bash
# Round-3 campaign, part C2: the incremental mel frontend (fbank_ring),
# A/B'd per mel family on the chip. Sequential on purpose: the dev chip is
# time-shared, and only back-to-back runs are comparable.
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

run fring_ab_ecapa python bench.py 256 20 --emb ecapa --ab --set fbank_ring=1
run fring_ab_xvect_sb python bench.py 256 20 --emb xvect-sb --ab --set fbank_ring=1
run fring_ab_resnet34 python bench.py 256 20 --emb resnet34 --ab --set fbank_ring=1
run fring_ab_titanet python bench.py 256 20 --emb titanet --ab --set fbank_ring=1

echo "=== campaign r3c2 done $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
