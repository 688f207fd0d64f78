#!/bin/bash
# Sequential chip-run queue for the outage-gated round-4 measurements.
#
# The TPU tunnel has multi-hour outages (CLAUDE.md); this script is meant
# to be launched ONCE the bounded probe says the backend is back, and runs
# every gated measurement in priority order — most artifact-critical first,
# so a re-outage mid-queue still lands the important numbers. Never run
# anything else (tests, probes) concurrently: the chip is time-shared and
# the host has one core.
#
# Usage:  bash benchmarks/run_chip_queue.sh [outdir]
set -u
cd /root/repo
OUT=${1:-logs/chip_queue_$(date +%H%M%S)}
mkdir -p "$OUT"
echo "chip queue -> $OUT"

probe() {
  timeout 45 python -c "import jax; print(jax.devices())" >"$OUT/probe.log" 2>&1
}

if ! probe; then
  echo "TPU backend DOWN (probe hung/failed) — aborting queue" | tee "$OUT/ABORTED"
  exit 3
fi
echo "probe OK: $(cat "$OUT/probe.log")"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s): $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc elapsed=$((SECONDS-t0))s"
  # re-probe between steps so a mid-queue outage is named, not mistaken
  # for a slow script on the next step
  if ! probe; then
    echo "backend lost after $name — stopping queue" | tee "$OUT/LOST_AFTER_$name"
    exit 4
  fi
  return $rc
}

# 1. The artifact backbone: every headline key RESULTS.md cites.
run bench 1800 python bench.py

# 2. Batched-IVF crossover at 10M (VERDICT item 2's chip evidence).
run ivf10m 1900 python benchmarks/exp_ivf_10m.py

# 3. ViT-L per-stage profile + patch-embed GEMM + remat (VERDICT item 4).
run vitl 1500 python benchmarks/exp_vitl_profile.py

echo "queue complete: $OUT"
