#!/bin/bash
# Round-5 queue 7: final profile speed/quality + remaining experiments.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
timeout 3600 python -u scripts/corpus_psnr.py --profile turbo \
    > /tmp/r5_q7_turbo_left.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --seg_scale 2 --corpus right \
    > /tmp/r5_q7_quality_right.log 2>&1
timeout 2400 python -u scripts/r5_fast_ab.py 3 > /tmp/r5_q7_ab.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --profile fast --corpus right \
    > /tmp/r5_q7_fast_right.log 2>&1
timeout 3000 python -u scripts/r5_fb_largemotion_ab.py > /tmp/r5_q7_fb_ab.log 2>&1
timeout 3600 python -u scripts/r5_hs_geometry_ab.py > /tmp/r5_q7_hs_geom.log 2>&1
echo QUEUE7_DONE
