#!/bin/bash
# Round-5 queue 5: quality stretch (boundary blend) + fast2 quality.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
# Exhaustive baseline with blend columns (sigma sweep, one flow pass):
timeout 3600 python -u scripts/corpus_psnr.py --blend 1,2,4,8 \
    > /tmp/r5_q5_blend.log 2>&1
echo QUEUE5_DONE
