#!/bin/bash
# Post-bench TPU measurement queue (round 3 close-out), highest value first:
#   1. microbench_solid.py        — phase split of the 110k-HEX8 load step
#      (decides the staged solid levers: Benes x-gather / mixed precision)
#   2. same with RDCFES_SOLID_FAST=1 — the staged Benes x-gather, measured
#   3. soak_adpm_scan.py          — ADPM scan-with-kernels vs per-step
#      (decides whether bench.py's ADPM leg adopts RDCFES_FAST_SCAN)
#   4. microbench_phases.py       — PIHNA post-kernel fixed-cost fit
# Each runs exclusively (the axon claim is exclusive); PYTHONPATH is
# APPENDED (overwriting clobbers the axon sitecustomize registration).
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
cd /root/repo

run() {
  local log=$1; shift
  echo "=== $(date +%H:%M:%S) $* -> $log"
  timeout 2400 "$@" > "$log" 2>&1
  echo "    exit=$? at $(date +%H:%M:%S)"
  sleep 60   # claim release cooldown before the next process
}

run /tmp/solid_variants.log python scripts/bench_solid_variants.py
run /tmp/mb_solid_f64.log   python scripts/microbench_solid.py
run /tmp/soak_adpm.log      python scripts/soak_adpm_scan.py
run /tmp/mb_phases.log      python scripts/microbench_phases.py
echo "queue done $(date +%H:%M:%S)"
