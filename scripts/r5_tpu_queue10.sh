#!/bin/bash
# Round-5 queue 10 (post-tunnel-recovery): warp param sweep + final bench.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
timeout 1800 python -u scripts/r5_warp_param_sweep.py > /tmp/r5_q10_warp_sweep.log 2>&1
timeout 4000 python -u bench.py > /tmp/r5_q10_bench.log 2>&1
echo QUEUE10_DONE
