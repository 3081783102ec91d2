#!/bin/bash
# Round-5 campaign part 1: lstm_block engine-level A/Bs + kernel-level sweep.
# Sequential: the dev chip is time-shared; parallel runs would contend.
set -x
cd /root/repo
OUT=docs/campaigns/r5
python bench.py --ab --set lstm_block=1 > $OUT/r5_lstm_ab.txt 2>&1
python bench.py --vad --ab --set lstm_block=1 > $OUT/r5_lstm_ab_vad.txt 2>&1
python scripts/lstm_block_ab.py 256 > $OUT/r5_lstm_kernel.txt 2>&1
echo DONE
