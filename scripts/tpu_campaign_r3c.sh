#!/bin/bash
# Round-3 TPU campaign, part 3: re-run the two scripts that crashed on a
# sys.path bug when invoked as `python scripts/<name>.py` (fixed).
set -u
cd /root/repo
LOG=.bench_logs
mkdir -p "$LOG"
run() {
  local name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) :: $*" >> "$LOG/campaign.log"
  timeout 5400 "$@" > "$LOG/$name.out" 2> "$LOG/$name.err"
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
}
run res2_parity2 python scripts/res2_parity_tpu.py
run int8_fidelity2 python scripts/int8_fidelity.py
echo "=== campaign part 3 done $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
