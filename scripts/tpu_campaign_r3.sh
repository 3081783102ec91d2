#!/bin/bash
# Round-3 TPU measurement campaign (VERDICT r2 "Next round" tasks 1-3):
#   - reconcile the flagship headline (HEAD vs pre-int8-refactor, back-to-back)
#   - A/B the two staged fast paths (pallas_res2, int8_trunk) per family
#   - first TPU row for xvect-sb
#   - on-device int8 embedding-cosine fidelity per family
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

# --- headline reconciliation triple: HEAD / pre-int8-refactor / HEAD ---
run recon_head_a python bench.py 256 20
if [ ! -d .ab_pre_int8 ]; then
  git worktree add --detach .ab_pre_int8 3fa8e67^ >> "$LOG/campaign.log" 2>&1
fi
run recon_pre_int8 bash -c "cd .ab_pre_int8 && python bench.py 256 20"
run recon_head_b python bench.py 256 20

# --- staged fast paths, one-process A/Bs ---
run res2_ab_ecapa python bench.py 256 20 --emb ecapa --ab --set pallas_res2=1
run int8_ab_xvector python bench.py 256 20 --ab --set int8_trunk=1
run int8_ab_ecapa python bench.py 256 20 --emb ecapa --ab --set int8_trunk=1
run int8_ab_resnet34 python bench.py 256 20 --emb resnet34 --ab --set int8_trunk=1
run int8_ab_titanet python bench.py 256 20 --emb titanet --ab --set int8_trunk=1

# --- sixth family: xvect-sb TPU rows (batch 256 A/B incl. int8, batch 1) ---
run int8_ab_xvect_sb python bench.py 256 20 --emb xvect-sb --ab --set int8_trunk=1
run xvect_sb_batch1 python bench.py 1 20 --emb xvect-sb

# --- on-device int8 fidelity table ---
run int8_fidelity python scripts/int8_fidelity.py

echo "=== campaign done $(date -u +%H:%M:%S)" >> "$LOG/campaign.log"
