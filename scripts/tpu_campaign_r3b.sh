#!/bin/bash
# Round-3 TPU campaign, part 2: runs after part 1 releases the chip.
#   - compiled-Mosaic parity of the fused SE-Res2 kernel (gate for flipping
#     its default on)
#   - int8 conv microbenchmark (diagnoses the engine-level int8 neutrality)
#   - precision-policy vs DER table (trained real PyanNet, three policies)
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

run res2_parity python scripts/res2_parity_tpu.py
run int8_micro python scripts/int8_microbench.py
run precision_der python scripts/precision_der.py 400

echo "=== campaign part 2 done $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
