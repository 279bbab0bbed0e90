#!/bin/bash
# Round-5 queue 6: AA'd half-res quality + seg_scale quality.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
# AA'd half2 search-only quality (does the prefilter recover the gap?):
timeout 3600 python -u scripts/corpus_psnr.py --bm_method matmul_half2 \
    > /tmp/r5_q6_half2aa.log 2>&1
# AA'd half (radius 1) for completeness:
timeout 3600 python -u scripts/corpus_psnr.py --bm_method matmul_half \
    > /tmp/r5_q6_halfaa.log 2>&1
# seg_scale=2 on top of the exhaustive search (isolates segmentation
# quality cost):
timeout 3600 python -u scripts/corpus_psnr.py --seg_scale 2 \
    > /tmp/r5_q6_segscale.log 2>&1
echo QUEUE6_DONE
