#!/bin/bash
# Round-5 campaign part 2: cohort-serving capacity on one chip.
set -x
cd /root/repo
OUT=docs/campaigns/r5
# device-side claim (production-PCIe proxy): scale K to the ceiling
python scripts/cohort_bench.py --cohorts 4,8,16,24 --periods 40 --mode pipelined --staged > $OUT/r5_cohort_staged.txt 2>&1
# admission churn inside the schedule
python scripts/cohort_bench.py --cohorts 8 --periods 40 --mode pipelined --staged --churn 64 > $OUT/r5_cohort_churn.txt 2>&1
# the realtime server's default blocked path (PCIe proxy): sustained at 4, boundary at 8
python scripts/cohort_bench.py --cohorts 4,8 --periods 40 --mode sync --staged > $OUT/r5_cohort_sync.txt 2>&1
# transfer-inclusive through the dev tunnel (documented tunnel-bound figure)
python scripts/cohort_bench.py --cohorts 4 --periods 40 --mode pipelined > $OUT/r5_cohort_tunnel.txt 2>&1
python scripts/cohort_bench.py --cohorts 4 --periods 40 --mode pipelined --int16 > $OUT/r5_cohort_tunnel_int16.txt 2>&1
echo DONE
