#!/bin/bash
# Round-5 campaign part 3: noise band, tuner objective, precision DER rows.
set -x
cd /root/repo
OUT=docs/campaigns/r5
python bench.py 256 20 --repeat 3 > $OUT/r5_flagship_band.txt 2>&1
python scripts/tune_bench.py --trials 20 --objective-trials 60 > $OUT/r5_tune.txt 2>&1
python scripts/precision_der.py 400 --family xvect-sb > $OUT/r5_pder_xvsb.txt 2>&1
python scripts/precision_der.py 400 > $OUT/r5_pder_sinc.txt 2>&1
echo DONE
