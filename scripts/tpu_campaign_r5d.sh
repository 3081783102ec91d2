#!/bin/bash
# Round-5 campaign part 4: per-family ledger refresh under the new
# defaults (lstm_block ON). Flagship row = the --repeat noise-band run.
set -x
cd /root/repo
OUT=docs/campaigns/r5
cp $OUT/r5_flagship_band.txt $OUT/r5_flagship.txt
python bench.py 256 40 --seg powerset  > $OUT/r5_powerset.txt 2>&1
python bench.py 256 40 --emb ecapa     > $OUT/r5_ecapa.txt 2>&1
python bench.py 256 40 --emb resnet34  > $OUT/r5_resnet34.txt 2>&1
python bench.py 256 40 --emb titanet   > $OUT/r5_titanet.txt 2>&1
python bench.py 256 40 --emb xvect-sb  > $OUT/r5_xvect_sb.txt 2>&1
python bench.py 256 40 --vad           > $OUT/r5_vad.txt 2>&1
echo DONE
