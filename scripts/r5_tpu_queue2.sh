#!/bin/bash
# Round-5 TPU queue 2: fast-profile quality ablation + clean speed A/B.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

# Which component costs the -0.36 dB? Search-only ablations:
timeout 3600 python -u scripts/corpus_psnr.py --bm_method matmul_half \
    > /tmp/r5_q2_half_only.log 2>&1
timeout 3600 python -u scripts/corpus_psnr.py --bm_method matmul_half2 \
    > /tmp/r5_q2_half2_only.log 2>&1
# Refine-only ablation (exhaustive search, analytic+plateau+1024 refine):
timeout 3600 python -u scripts/corpus_psnr.py --refine_sup analytic \
    --plateau 1e-3 --iter_max 1024 > /tmp/r5_q2_refine_only.log 2>&1
# Clean interleaved speed A/B (no concurrent CPU load this time):
timeout 2400 python -u scripts/r5_fast_ab.py 4 > /tmp/r5_q2_ab.log 2>&1
echo QUEUE2_DONE
