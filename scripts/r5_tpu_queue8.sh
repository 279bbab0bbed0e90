#!/bin/bash
# Round-5 queue 8: blend-on-quality, turbo streaming, anchors, bench pre-run.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
timeout 3000 python -u scripts/r5_fb_largemotion_ab.py > /tmp/r5_q8_fb_ab.log 2>&1
timeout 3600 python -u scripts/r5_hs_geometry_ab.py > /tmp/r5_q8_hs_geom.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --seg_scale 2 --blend 1,2,4 \
    > /tmp/r5_q8_blend_quality.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --pipelined --profile turbo \
    --prewarm > /tmp/r5_q8_pipelined_turbo.log 2>&1
timeout 3000 python -u scripts/r5_oracle_anchor.py > /tmp/r5_q8_anchor.log 2>&1
timeout 4000 python -u bench.py > /tmp/r5_q8_bench.log 2>&1
echo QUEUE8_DONE
