#!/bin/bash
# Block until the axon tunnel answers (jax.devices() in a killable
# subprocess — a down tunnel hangs forever, see .claude/skills/verify).
# Usage: scripts/wait_tpu.sh [max_seconds]
MAX=${1:-14400}
start=$(date +%s)
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tpu alive after $(( $(date +%s) - start ))s"
    exit 0
  fi
  if (( $(date +%s) - start > MAX )); then
    echo "tpu still down after ${MAX}s" >&2
    exit 1
  fi
  sleep 120
done
