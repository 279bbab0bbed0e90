#!/bin/bash
# Round-4 TPU measurement queue — run AFTER scripts/r4_dist_on_tpu.py.
# Each job logs to /tmp/r4_q_<name>.log; a dead tunnel fails fast via
# the probe. Sequenced so the single tunneled chip is never contended.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

probe() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  if ! probe; then echo "[$name] TUNNEL DOWN — skipped" ; return 1; fi
  echo "[$name] start $(date +%H:%M:%S)"
  timeout "$tmo" "$@" > "/tmp/r4_q_${name}.log" 2>&1
  echo "[$name] rc=$? end $(date +%H:%M:%S)"
}

run bench        4800 python -u bench.py
run refine_warp  3600 python -u scripts/corpus_psnr.py --refine_warp
run affine_on    5400 python -u scripts/corpus_psnr.py --mode affine --normalize_steps on
run affine_off   5400 python -u scripts/corpus_psnr.py --mode affine --normalize_steps off
run pipelined    3600 python -u scripts/corpus_psnr.py --pipelined
run hs_probe     3600 python -u scripts/r4_hs_formulation_probe.py
run ms_sched     5400 python -u scripts/r4_ms_sched_ab.py
echo "QUEUE DONE $(date +%H:%M:%S)"
