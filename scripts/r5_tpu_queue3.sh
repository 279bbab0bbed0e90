#!/bin/bash
# Round-5 queue 3: Farneback large-motion A/B (TPU) + oracle anchors (CPU).
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
timeout 3000 python -u scripts/r5_fb_largemotion_ab.py > /tmp/r5_q3_fb_ab.log 2>&1
timeout 3000 python -u scripts/r5_oracle_anchor.py > /tmp/r5_q3_anchor.log 2>&1
echo QUEUE3_DONE
