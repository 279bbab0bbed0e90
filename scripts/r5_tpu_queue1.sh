#!/bin/bash
# Round-5 TPU measurement queue 1: fast-profile speed + quality.
# Run in background; each stage logs to /tmp/r5_q1_*.log.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

timeout 2400 python -u scripts/r5_fast_ab.py 4 > /tmp/r5_q1_ab.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --profile fast \
    > /tmp/r5_q1_quality_left.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --profile fast --corpus right \
    > /tmp/r5_q1_quality_right.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --pipelined --profile fast \
    --prewarm > /tmp/r5_q1_pipelined_fast.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --pipelined --prewarm \
    > /tmp/r5_q1_pipelined_default.log 2>&1
echo QUEUE1_DONE
