#!/bin/bash
# Round-5 queue 4: HS tile-geometry experiment.
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
timeout 3600 python -u scripts/r5_hs_geometry_ab.py > /tmp/r5_q4_hs_geom.log 2>&1
echo QUEUE4_DONE
